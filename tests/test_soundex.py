"""American Soundex (functions/normalize.py:soundex_code)."""

from pyspark.sql import functions as F

from invoice_ocr_reconciler_spark.functions.normalize import soundex_code


def _codes(spark, names):
    df = spark.createDataFrame([(n,) for n in names], "name string")
    return [
        r.c for r in df.select(soundex_code(F.col("name")).alias("c")).collect()
    ]


def test_published_vectors(spark):
    got = _codes(
        spark,
        ["Robert", "Rupert", "Ashcraft", "Tymczak", "Pfister",
         "Honeyman", "Washington", "Jackson"],
    )
    assert got == ["R163", "R163", "A261", "T522", "P236",
                   "H555", "W252", "J250"]


def test_hw_merge_and_vowel_separation(spark):
    # Ashcraft: s(2)-h-c(2) merge across H -> one 2; Tymczak: c(2)
    # vowel a separates z(2) -> NOT merged? (z follows c directly: 22
    # collapses; the vowel separates m/z not c/z) — both covered above.
    # Here: first-letter code participates (Pfister) and 'Czar' C+Z=22
    assert _codes(spark, ["czar", "CZAR"]) == ["C600", "C600"]


def test_phonetic_collisions_block_together(spark):
    a, b = _codes(spark, ["Smith", "Smyth"])
    assert a == b == "S530"
    x, y = _codes(spark, ["Jackson", "Jaxon"])
    assert x == y


def test_non_letters_and_empty(spark):
    got = _codes(spark, ["O'Brien", "12 34", "", None])
    assert got[0] == "O165"
    assert got[1] is None and got[2] is None and got[3] is None


def test_short_names_padded(spark):
    assert _codes(spark, ["Lee", "A"]) == ["L000", "A000"]
