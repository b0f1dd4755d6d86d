#!/usr/bin/env python
"""Benchmark harness.

Default: runs the headline pipelines over $GRAFT_SF_DIR (default
/root/testdata/sf0.1) under ray.init(address="local",
num_cpus=$RAY_GRAFT_CPUS or 32) and prints ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {...per-pipeline sec...}, "sf": ..., "num_cpus": N,
     "rows_per_s": ...}

--scaling: runs the flagship validation pipeline twice in FRESH processes
(num_cpus=8 then num_cpus=32) on the same input and reports both
throughputs + scaling efficiency (the sandbox stand-in for the north rule's
N vs 4N cluster criterion), appending the result to BASELINE.md.

--one NAME: run a single named pipeline and print its JSON (used by the
scaling subprocess).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
METRIC = "validated sequences/sec (rows/sec through full constraint suite)"


def _init_ray():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=NUM_CPUS,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False


def _consume(res):
    """Force execution; return row count."""
    import pandas as pd
    import pyarrow as pa

    import ray.data

    if isinstance(res, ray.data.Dataset):
        n = 0
        for b in res.iter_batches(batch_size=65536, batch_format="pyarrow"):
            n += b.num_rows
        return n
    if isinstance(res, pd.DataFrame):
        return len(res)
    if isinstance(res, pa.Table):
        return res.num_rows
    return 0


def pipeline_validate_full(sf_dir: str) -> int:
    """Flagship: full constraint suite (checks + sketches + dup shuffle)."""
    from hepdata_validator_ray.engine import ValidationConfig, ValidationEngine
    from hepdata_validator_ray.synth import ensure_sequences_parquet

    p = ensure_sequences_parquet(sf_dir)
    eng = ValidationEngine(ValidationConfig(batch_size=16384, chunk_files=64))
    res = eng.validate(p)
    return res.n_rows


def pipeline_row_checks(sf_dir: str) -> int:
    from hepdata_validator_ray.pipelines.validation import violation_counts
    from hepdata_validator_ray.synth import ensure_sequences_parquet

    return _consume(violation_counts(ensure_sequences_parquet(sf_dir)))


def pipeline_q1(sf_dir: str) -> int:
    from hepdata_validator_ray.pipelines.relational import q1_pricing_summary

    return _consume(q1_pricing_summary(sf_dir))


def pipeline_dedup_minhash(sf_dir: str) -> int:
    from hepdata_validator_ray.pipelines.dedup import minhash_lsh_pairs

    return _consume(minhash_lsh_pairs(f"{sf_dir}/documents.parquet", threshold=0.5))


def pipeline_ann(sf_dir: str) -> int:
    from hepdata_validator_ray.pipelines.similarity import ann_topk_bruteforce

    return _consume(ann_topk_bruteforce(f"{sf_dir}/embeddings.parquet", k=10, n_queries=5))


def pipeline_text_quality(sf_dir: str) -> int:
    from hepdata_validator_ray.pipelines.text import quality_scores

    return _consume(quality_scores(f"{sf_dir}/documents.parquet"))


PIPELINES = {
    "validate_full": pipeline_validate_full,
    "row_checks": pipeline_row_checks,
    "q1": pipeline_q1,
    "dedup_minhash": pipeline_dedup_minhash,
    "ann_topk": pipeline_ann,
    "text_quality": pipeline_text_quality,
}

#: rows processed by the flagship (for throughput) — n returned by pipeline
HEADLINE = "validate_full"


def run_one(name: str) -> dict:
    _init_ray()
    # warm the synth cache outside the timed region
    from hepdata_validator_ray.synth import ensure_sequences_parquet

    ensure_sequences_parquet(SF_DIR)
    t0 = time.perf_counter()
    n = PIPELINES[name](SF_DIR)
    dt = time.perf_counter() - t0
    return {"name": name, "sec": round(dt, 3), "rows": n, "rows_per_s": round(n / dt, 1) if dt else 0.0}


def main():
    args = sys.argv[1:]
    if args and args[0] == "--one":
        out = run_one(args[1])
        print(json.dumps(out))
        import ray

        ray.shutdown()
        return

    if args and args[0] == "--scaling":
        results = {}
        for cpus in (8, 32):
            env = dict(os.environ, RAY_GRAFT_CPUS=str(cpus), GRAFT_SF_DIR=SF_DIR)
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--one", HEADLINE],
                env=env,
                capture_output=True,
                text=True,
                timeout=1800,
            )
            line = [l for l in p.stdout.strip().splitlines() if l.startswith("{")][-1]
            results[cpus] = json.loads(line)
        thr8 = results[8]["rows_per_s"]
        thr32 = results[32]["rows_per_s"]
        eff = (thr32 / thr8) / 4 if thr8 else 0.0
        out = {
            "metric": "scaling efficiency (num_cpus 8 -> 32, factor 4)",
            "sf": SF_DIR,
            "throughput_8": thr8,
            "throughput_32": thr32,
            "speedup": round(thr32 / thr8, 3) if thr8 else 0.0,
            "efficiency": round(eff, 3),
            "sec_8": results[8]["sec"],
            "sec_32": results[32]["sec"],
            "rows": results[32]["rows"],
        }
        print(json.dumps(out))
        _append_baseline(out)
        return

    # default: full suite
    _init_ray()
    from hepdata_validator_ray.synth import ensure_sequences_parquet

    ensure_sequences_parquet(SF_DIR)
    queries = {}
    total = 0.0
    headline_rows = 0
    headline_sec = 0.0
    for name, fn in PIPELINES.items():
        t0 = time.perf_counter()
        n = fn(SF_DIR)
        dt = time.perf_counter() - t0
        queries[name] = round(dt, 3)
        total += dt
        if name == HEADLINE:
            headline_rows, headline_sec = n, dt
    out = {
        "metric": METRIC,
        "value": round(total, 3),
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "headline_rows": headline_rows,
        "rows_per_s": round(headline_rows / headline_sec, 1) if headline_sec else 0.0,
    }
    print(json.dumps(out))
    import ray

    ray.shutdown()


def _append_baseline(out: dict) -> None:
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BASELINE.md"), "a") as fh:
            fh.write(
                f"\n## Measured scaling ({time.strftime('%Y-%m-%d %H:%M')})\n\n"
                f"| num_cpus | rows | sec | rows/s |\n|---|---|---|---|\n"
                f"| 8 | {out['rows']} | {out['sec_8']} | {out['throughput_8']} |\n"
                f"| 32 | {out['rows']} | {out['sec_32']} | {out['throughput_32']} |\n\n"
                f"Speedup 8→32: **{out['speedup']}×**; scaling efficiency "
                f"(speedup/4): **{out['efficiency']}** (target ≥ 0.8).\n"
            )
    except OSError:
        pass


if __name__ == "__main__":
    main()
