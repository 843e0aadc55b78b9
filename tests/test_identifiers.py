"""Units for the provenance/reuse band: extract_identifiers,
detect_license, strip_reply_chains."""

from invoice_ocr_reconciler_spark.operators.identifiers import (
    detect_license,
    extract_identifiers,
    strip_reply_chains,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_extract_identifiers_kinds_and_checksum(spark):
    docs = _docs(spark, [
        (1, "see doi:10.1234/abc-DEF.5 and arXiv:2101.00001v2 "
            "plus isbn 9780306406157 ok"),
        (2, "bad isbn 9780306406158 here"),
        (3, "no ids"),
        (4, None),
        (5, "two dois 10.5555/x.y;z and 10.1000/182"),
    ])
    out = [(r.doc_id, r.kind, r.ident, r.is_valid)
           for r in extract_identifiers(docs).collect()]
    assert (1, "doi", "10.1234/abc-DEF.5", True) in out
    assert (1, "arxiv", "arXiv:2101.00001v2", True) in out
    assert (1, "isbn13", "9780306406157", True) in out
    assert (2, "isbn13", "9780306406158", False) in out
    assert len([r for r in out if r[0] == 5]) == 2
    assert not [r for r in out if r[0] in (3, 4)]


def test_extract_identifiers_isbn_requires_word_boundary(spark):
    # a 14-digit run is not an ISBN mention
    docs = _docs(spark, [(1, "junk 97803064061579 junk")])
    assert extract_identifiers(docs).count() == 0


def test_detect_license_precedence_and_flags(spark):
    docs = _docs(spark, [
        (1, "Permission is hereby granted, free of charge"),
        (2, "Licensed under the Apache License, Version 2.0"),
        (3, "the GNU General Public License applies"),
        (4, "Redistribution and use in source and binary forms"),
        (5, "Creative Commons Attribution-ShareAlike terms"),
        (6, "Creative Commons Attribution terms"),
        (7, "no license text"),
        (8, None),
        # MIT phrase + GPL phrase -> precedence picks MIT
        (9, "Permission is hereby granted under the GNU General Public License"),
        # apache phrase without the version phrase does NOT match
        (10, "mentions the apache license casually"),
    ])
    out = {r.doc_id: (r.license, r.permissive)
           for r in detect_license(docs).collect()}
    assert out[1] == ("MIT", True)
    assert out[2] == ("Apache-2.0", True)
    assert out[3] == ("GPL", False)
    assert out[4] == ("BSD", True)
    assert out[5] == ("CC-BY-SA", False)
    assert out[6] == ("CC-BY", True)
    assert out[7] == ("none", False) and out[8] == ("none", False)
    assert out[9] == ("MIT", True)
    assert out[10] == ("none", False)


def test_strip_reply_chains(spark):
    docs = _docs(spark, [
        (1, "reply here\nOn Mon, Jan 1, someone wrote:\n> quoted line\n"
            "> > deeper quote\nmore text"),
        (2, "no quotes at all"),
        (3, None),
        (4, ">> compact depth two\n >  spaced > marker"),
    ])
    out = {r.doc_id: r for r in strip_reply_chains(docs).collect()}
    r1 = out[1]
    assert (r1.n_lines, r1.n_quoted, r1.n_attrib, r1.max_depth) == (5, 2, 1, 2)
    assert r1.text_clean == "reply here\nmore text"
    assert out[2].text_clean == "no quotes at all" and out[2].max_depth == 0
    assert out[3].text_clean == "" and out[3].n_lines == 1
    # compact '>>' counts depth 2; spaced '> ' markers count their '>'s
    assert out[4].n_quoted == 2 and out[4].max_depth == 2
    assert out[4].text_clean == ""


def test_strip_reply_chains_partition_invariance(spark):
    docs = _docs(spark, [(i, f"line {i}\n> q{i}") for i in range(40)])
    a = sorted(map(tuple, strip_reply_chains(docs).collect()))
    b = sorted(map(tuple, strip_reply_chains(docs.repartition(7)).collect()))
    assert a == b
