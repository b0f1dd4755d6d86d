"""Adversarial-skew stress artifact (VERDICT r4 #9): run the flagship
validation suite, the sequence-content dedup exchange, and the Bloom +
distributed-verify clean path over (a) a uniform 8M-row corpus and (b) the
north rule's skew scenario — one source at ≥90% mass, 20% dup rows on hot
shared id classes (~200 members each) — and report wall time + driver peak
RSS per path.  Pass criteria (recorded in BASELINE.md): no driver OOM, the
skew-handling machinery visibly engaged (shard_skew_forecast's measured
go/no-go on the skewed corpus), and skewed wall within 2x of uniform.

Usage: python tools/skew_stress.py [--rows 8000000] [--cpus 32]
Prints one JSON line per (corpus, path) measurement plus a summary line.
"""

from __future__ import annotations

import argparse
import json
import resource
import sys
import time

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.1"


def rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def consume(ds) -> int:
    import pandas as pd

    if isinstance(ds, pd.DataFrame):
        return len(ds)
    n = 0
    for b in ds.iter_batches(batch_size=65536, batch_format="pyarrow"):
        n += b.num_rows
    return n


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=8_000_000)
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    import ray

    ray.init(address="local", num_cpus=args.cpus, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from hepdata_validator_ray.engine import ValidationConfig, ValidationEngine
    from hepdata_validator_ray.pipelines.clean import clean_survivor_stats
    from hepdata_validator_ray.pipelines.dedup import sequence_content_dedup
    from hepdata_validator_ray.pipelines.sampling import shard_skew_forecast
    from hepdata_validator_ray.synth import (
        ensure_sequences_parquet,
        ensure_skewed_sequences_parquet,
    )

    t0 = time.perf_counter()
    uniform = ensure_sequences_parquet(SF, n_rows=args.rows, n_files=32)
    skewed = ensure_skewed_sequences_parquet(SF, n_rows=args.rows, n_files=32)
    print(json.dumps({"stage": "synth", "sec": round(time.perf_counter() - t0, 1)}))

    def flagship(path: str) -> int:
        eng = ValidationEngine(ValidationConfig(batch_size=16384, chunk_files=64))
        return ValidationEngine.validate(eng, path).n_rows

    paths = {
        "flagship": flagship,
        "dedup_content": lambda p: consume(sequence_content_dedup(p)),
        "clean_survivors": lambda p: consume(clean_survivor_stats(p)),
    }
    results: dict[str, dict[str, float]] = {}
    for corpus_name, corpus in (("uniform", uniform), ("skewed", skewed)):
        for path_name, fn in paths.items():
            t = time.perf_counter()
            n = fn(corpus)
            dt = time.perf_counter() - t
            results.setdefault(path_name, {})[corpus_name] = dt
            print(
                json.dumps(
                    {
                        "corpus": corpus_name,
                        "path": path_name,
                        "sec": round(dt, 2),
                        "rows": int(n),
                        "driver_peak_rss_mb": round(rss_mb(), 1),
                    }
                )
            )

    # skew-machinery evidence: the measured plain-vs-salted shard forecast
    # on the skewed corpus (hot dup-id keys are exactly what it detects)
    fc = shard_skew_forecast(skewed)
    import pandas as pd

    if not isinstance(fc, pd.DataFrame):
        fc = fc.to_pandas()
    print(json.dumps({"stage": "shard_skew_forecast", "rows": fc.to_dict("records")}, default=str))

    summary = {
        "stage": "summary",
        "rows": args.rows,
        "num_cpus": args.cpus,
        "driver_peak_rss_mb": round(rss_mb(), 1),
        "within_2x": {
            k: round(v["skewed"] / v["uniform"], 2) for k, v in results.items()
        },
    }
    print(json.dumps(summary))
    ray.shutdown()


if __name__ == "__main__":
    main()
