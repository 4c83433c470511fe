"""spark-submit entry point for the full KG-construction job.

Cluster deployment (north_rule: spark-submit --py-files at two cluster
sizes)::

    python scripts/make_pyfiles.py dist/cow_spark.zip
    spark-submit --py-files dist/cow_spark.zip \
        --conf spark.sql.adaptive.enabled=true \
        scripts/run_pipeline.py \
        --input  s3://bucket/transcripts/ \
        --spec   specs/transcripts.json \
        --output s3://bucket/kg/ \
        --name   transcripts --snapshot-id <iceberg-snapshot> \
        --timestamp 2026-08-16T12:00 --buckets 4096 --resume

Local smoke::

    python scripts/run_pipeline.py --demo
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="transcripts table path (parquet/iceberg)")
    ap.add_argument("--spec", help="mapping spec JSON path")
    ap.add_argument("--output", default="out/kg", help="output root")
    ap.add_argument("--name", default="transcripts")
    ap.add_argument("--snapshot-id", default="unknown-snapshot")
    ap.add_argument("--timestamp", default="1970-01-01T00:00",
                    help="run timestamp (explicit → deterministic provenance)")
    ap.add_argument("--buckets", type=int, default=64,
                    help="resume/bucket granularity (hash(conv_id) buckets)")
    ap.add_argument("--resume", action="store_true",
                    help="skip buckets recorded in the completion manifest")
    ap.add_argument("--nquads", action="store_true",
                    help="also write N-Quads text next to the quad table")
    ap.add_argument("--qa-gate", action="store_true",
                    help="run the publish gate (lexical + structural "
                         "QA) and FAIL the job on violations")
    ap.add_argument("--functional-preds", default="",
                    help="comma-separated predicate IRIs declared "
                         "functional for the structural gate")
    ap.add_argument("--shapes", default="",
                    help="path to a JSON list of SHACL-lite shape dicts "
                         "(plans/validate.py:shape_report); violations "
                         "fail the --qa-gate")
    ap.add_argument("--demo", action="store_true",
                    help="run on synthetic transcripts with the full spec")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from cow_spark.operators.extract import extract_quads
    from cow_spark.plans.nanopub import (
        NanopubContext,
        assemble_nanopub,
        dataset_sha1,
        spec_provenance_quads,
    )
    from cow_spark.plans.resume import run_with_resume
    from cow_spark.session import get_session
    from cow_spark.sources.sinks import write_nquads, write_quads_table
    from cow_spark.spec.mapping import MappingSpec
    from cow_spark.spec.presets import transcripts_full_spec
    from cow_spark.sources.transcripts import transcripts_df

    spark = get_session(app_name=f"cow_spark-{args.name}")

    if args.demo:
        df = transcripts_df(spark, 100_000)
        spec = MappingSpec.from_json(transcripts_full_spec())
    else:
        df = spark.read.parquet(args.input)
        spec = MappingSpec.from_json(args.spec)
    spec.validate(df.columns)  # fail fast, driver-side (S6)

    ctx = NanopubContext(
        base=spec.base, name=args.name,
        source_hash=dataset_sha1(args.snapshot_id), timestamp=args.timestamp,
    )

    quad_path = os.path.join(args.output, "quads")
    manifest = os.path.join(args.output, "_manifest")

    if args.resume:
        done = run_with_resume(
            df, "conv_id", args.buckets,
            lambda d: extract_quads(d, spec, graph=ctx.assertion,
                                    passthrough=["_bucket"]),
            quad_path, manifest,
        )
        print(f"processed buckets: {sorted(done)}")
        quads = spark.read.parquet(quad_path).drop("_bucket")
    else:
        quads = extract_quads(df, spec, graph=ctx.assertion)
        write_quads_table(quads, quad_path, n_buckets=args.buckets)
        quads = spark.read.parquet(quad_path).select(
            "g", "s", "p", "o_kind", "o_lex", "o_dt", "o_lang")

    prov = assemble_nanopub(
        quads.limit(0), ctx, source_path=f"{args.name}@{args.snapshot_id}",
        with_partition_provenance=False,
    ).unionByName(spec_provenance_quads(spark, ctx, spec))
    write_quads_table(prov, os.path.join(args.output, "provenance"),
                      n_buckets=1)

    if args.nquads or args.demo:
        write_nquads(quads, os.path.join(args.output, "nquads"),
                     graph=ctx.assertion)

    if args.qa_gate or args.demo:
        # publish gate: a KG with datatype-invalid literals, functional
        # double-values, or dangling references must not ship silently
        from cow_spark.plans.validate import (integrity_report,
                                              validate_typed_literals)

        lex = validate_typed_literals(quads).count()
        preds = [p for p in args.functional_preds.split(",") if p]
        report = integrity_report(quads, preds,
                                  dangling_prefix=spec.base)
        func_n = report.where(
            F.col("check") == "functional-violation").count()
        dang_n = report.where(
            F.col("check") == "dangling-reference").count()
        shape_n = 0
        if args.shapes:
            import json

            from cow_spark.plans.validate import shape_report

            with open(args.shapes) as fh:
                shapes = json.load(fh)
            shape_n = shape_report(quads, shapes).count()
        # dangling internal references are a TRIAGE list (a mapping may
        # deliberately never describe some linked node); the gate fails
        # on the hard classes only
        print(f"qa gate: invalid literals={lex}, functional "
              f"violations={func_n}, dangling internal refs={dang_n}, "
              f"shape violations={shape_n}")
        if args.qa_gate and (lex or func_n or shape_n):
            raise SystemExit(
                f"QA gate failed: {lex} invalid literals, "
                f"{func_n} functional violations, {shape_n} shape "
                "violations — inspect with validate_typed_literals / "
                "integrity_report / shape_report")

    n = quads.count()
    print(f"quads written: {n} → {quad_path}")
    spark.stop()


if __name__ == "__main__":
    main()
