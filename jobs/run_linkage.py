"""Cluster job entrypoint: spark-submit --py-files dist/invoice_ocr_reconciler_spark.zip \
    jobs/run_linkage.py --a <parquet> --b <parquet> --id-a <col> --id-b <col> \
    --block <col> --fields name:0.95:0.001,city:0.8:0.1 --lower 4.0 --upper 12.0 \
    --out <dir> [--fit-em] [--em-iters 30] [--keep-non-matches]

Fellegi–Sunter record linkage between two tables (operators/linkage.py):
blocked equi-join candidates, per-field log2(m/u) agreement weights, a
three-way match/possible/non-match decision, written as parquet plus a
one-row stats JSON. ``--fields`` gives field:m:u triples; each field F
must exist on BOTH inputs (compared as a.F vs b.F, NULL = weight 0).
With ``--fit-em`` the m/u priors are re-estimated first by EM over the
aggregated agreement-pattern table (fs_em_fit) and the fitted values are
used for scoring and recorded in the stats JSON.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _parse_fields(spec: str):
    from invoice_ocr_reconciler_spark.operators.linkage import FieldSpec

    out = []
    for part in spec.split(","):
        name, m, u = part.split(":")
        out.append(FieldSpec(name, float(m), float(u)))
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--a", required=True, help="left table parquet")
    ap.add_argument("--b", required=True, help="right table parquet")
    ap.add_argument("--id-a", required=True)
    ap.add_argument("--id-b", required=True)
    ap.add_argument("--block", required=True, help="block key column (both sides)")
    ap.add_argument("--fields", required=True, help="name:m:u[,name:m:u...]")
    ap.add_argument("--lower", type=float, required=True)
    ap.add_argument("--upper", type=float, required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--fit-em", action="store_true")
    ap.add_argument("--em-iters", type=int, default=30)
    ap.add_argument("--keep-non-matches", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from invoice_ocr_reconciler_spark.operators.linkage import (
        FieldSpec,
        fs_em_fit,
        fs_linkage,
    )
    from invoice_ocr_reconciler_spark.session import get_spark

    spark = get_spark(app_name="fs-linkage")
    fields = _parse_fields(args.fields)

    a_raw = spark.read.parquet(args.a)
    b_raw = spark.read.parquet(args.b)
    a = a_raw.select(
        F.col(args.id_a).alias("id_a"),
        F.col(args.block).alias("block"),
        *[F.col(s.name).alias(f"a_{s.name}") for s in fields],
    )
    b = b_raw.select(
        F.col(args.id_b).alias("id_b"),
        F.col(args.block).alias("block"),
        *[F.col(s.name).alias(f"b_{s.name}") for s in fields],
    )

    if args.fit_em:
        from invoice_ocr_reconciler_spark.operators.linkage import (
            agreement_col,
        )

        pairs = a.join(b, "block").select(
            *[agreement_col(s.name).alias(f"agree_{s.name}") for s in fields]
        )
        fitted = {
            r["field"]: r
            for r in fs_em_fit(
                pairs,
                [f"agree_{s.name}" for s in fields],
                iters=args.em_iters,
            ).collect()
        }
        fields = [
            FieldSpec(s.name, fitted[f"agree_{s.name}"]["m"], fitted[f"agree_{s.name}"]["u"])
            for s in fields
        ]

    out = fs_linkage(
        a,
        b,
        fields=fields,
        lower=args.lower,
        upper=args.upper,
        keep_non_matches=args.keep_non_matches,
    )
    out.write.mode("overwrite").parquet(os.path.join(args.out, "links"))

    links = spark.read.parquet(os.path.join(args.out, "links"))
    by_decision = {
        r["decision"]: r["n"]
        for r in links.groupBy("decision").agg(F.count("*").alias("n")).collect()
    }
    stats = {
        "n_a": a_raw.count(),
        "n_b": b_raw.count(),
        "decisions": by_decision,
        "fields": [
            {"name": s.name, "m": s.m, "u": s.u,
             "w_agree": s.w_agree, "w_disagree": s.w_disagree}
            for s in fields
        ],
        "fitted_by_em": bool(args.fit_em),
    }
    with open(os.path.join(args.out, "linkage_stats.json"), "w") as fh:
        json.dump(stats, fh, indent=2, sort_keys=True)
    print(json.dumps(stats, sort_keys=True))


if __name__ == "__main__":
    main()
