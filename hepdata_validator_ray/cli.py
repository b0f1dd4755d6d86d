"""CLI entrypoint — mirrors the reference's ``hepdata-validate`` UX
(reference cli.py:12-30): validate a path, print the verdict and the
per-partition errors, exit 1 when invalid.

Usage:
    python -m hepdata_validator_ray.cli validate PATH [--output DIR]
        [--schema-version V] [--suite NAME] [--resume/--no-dup] ...
    python -m hepdata_validator_ray.cli synth SF_DIR [--rows N] [--files K]

Owns its Ray session (guarded init; the library itself never calls
ray.init, per the driver contract).
"""

from __future__ import annotations

import argparse
import sys


def _ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)


def cmd_validate(args: argparse.Namespace) -> int:
    _ray_session()
    from hepdata_validator_ray.checks.base import CheckContext, get_check_suite
    from hepdata_validator_ray.engine import ValidationConfig, ValidationEngine

    if args.suite and args.suite_config:
        # both would silently shadow each other — surface the conflict
        print("Error: --suite and --suite-config are mutually exclusive.")
        return 2
    ctx = CheckContext(schema_version=args.schema_version)
    suite = get_check_suite(args.suite) if args.suite else None
    if args.suite_config:
        # ≙ the reference's load_custom_schema path (data_file_validator.py:52-78):
        # a JSON config (extends/checks/exclude/declare/context) loaded and
        # registered by name; declarative "declare" entries compile to
        # vectorized checks with no Python registration
        from dataclasses import replace as _dc_replace

        from hepdata_validator_ray.sources.suite_loader import load_suite_config

        suite, ctx_over = load_suite_config(args.suite_config)
        if ctx_over is not None:
            ctx = ctx_over
        elif suite.version:
            # align the run context with the suite's declared version:
            # CheckStage re-filters the suite by ctx.schema_version, so
            # without this a 1.2.0 config's version-gated checks silently
            # vanish under the CLI's default 1.1.1 (same alignment as
            # validate_bundle's per-table override path)
            ctx = _dc_replace(ctx, schema_version=suite.version)
    cfg = ValidationConfig(
        ctx=ctx,
        suite=suite,
        dup_check=not args.no_dup,
        enable_unigram=not args.no_unigram,
        chunk_files=args.chunk_files,
    )
    eng = ValidationEngine(cfg)
    if args.bundle:
        # single-bundle mode: one parquet, logical tables tagged by a column;
        # --table-suites maps table tags to registered suites (≙ per-file
        # data_schema, full_submission_validator.py:330-347)
        import json as _json

        table_suites = _json.loads(args.table_suites) if args.table_suites else None
        res = eng.validate_bundle(
            args.path,
            output_dir=args.output,
            table_column=args.table_column,
            split_dir=args.split_dir,
            table_suites=table_suites,
        )
    else:
        # dirs, file lists, .zip/.tar.gz archives and .parquet.gz all route
        # through validate (archive detection is automatic)
        res = eng.validate(args.path, output_dir=args.output)
    # verdict format mirrors cli.py:20-30 ("{path} is valid/invalid HEPData")
    if res.valid:
        print(f"{args.path} is valid.")
    else:
        print(f"{args.path} is invalid.")
    print(res.summary())
    if not res.valid and args.show_errors:
        failed = res.verdicts[~res.verdicts.passed]
        for pid, grp in failed.groupby("partition_id"):
            print(f"\t{pid}")
            for _, r in grp.iterrows():
                print(f"\t\t error - {r.check_name}: {r.n_violations} violation(s)")
    import ray

    ray.shutdown()
    return 0 if res.valid else 1


def cmd_synth(args: argparse.Namespace) -> int:
    from hepdata_validator_ray.synth import ensure_sequences_parquet

    p = ensure_sequences_parquet(args.sf_dir, n_files=args.files, n_rows=args.rows, inject=not args.clean)
    print(p)
    return 0


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="hepdata-validator-ray")
    sub = ap.add_subparsers(dest="cmd", required=True)

    v = sub.add_parser(
        "validate", help="validate a parquet sequence table (dir, file list, .zip/.tar.gz archive, or bundle)"
    )
    v.add_argument("path")
    v.add_argument("--bundle", action="store_true", help="treat PATH as a single multi-table bundle parquet")
    v.add_argument("--table-column", default="table", help="bundle mode: logical-table tag column")
    v.add_argument("--split-dir", default=None, help="bundle mode: also write the per-table split here")
    v.add_argument("--output", default=None, help="output dir (violations/verdicts/manifest); enables resume")
    v.add_argument("--schema-version", default="1.1.1")
    v.add_argument("--suite", default=None, help="registered custom check-suite name")
    v.add_argument(
        "--suite-config",
        default=None,
        help="path/URL of a JSON suite config (extends/checks/exclude/declare/context)",
    )
    v.add_argument(
        "--table-suites",
        default=None,
        help='bundle mode: JSON map of table tag -> registered suite name, e.g. \'{"t1": "lenient"}\'',
    )
    v.add_argument("--no-dup", action="store_true")
    v.add_argument("--no-unigram", action="store_true")
    v.add_argument("--chunk-files", type=int, default=64)
    v.add_argument("--show-errors", action="store_true", default=True)
    v.set_defaults(fn=cmd_validate)

    s = sub.add_parser("synth", help="materialize the synthetic sequence table")
    s.add_argument("sf_dir")
    s.add_argument("--rows", type=int, default=None)
    s.add_argument("--files", type=int, default=8)
    s.add_argument("--clean", action="store_true")
    s.set_defaults(fn=cmd_synth)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
