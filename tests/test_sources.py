"""Source-format breadth (JSONL/gz) + suite-config loading (remote-schema
analogue) tests."""

import json

import pytest

SF = "/root/testdata/sf0.001"


def test_jsonl_roundtrip_and_checks():
    from hepdata_validator_ray.checks.base import CheckContext
    from hepdata_validator_ray.pipelines.validation import _violation_pairs_batch
    from hepdata_validator_ray.sources.jsonl import ensure_sequences_jsonl, read_sequences_jsonl
    from hepdata_validator_ray.synth import expected_violation_doc_rows, generate_sequences_table

    path = ensure_sequences_jsonl(SF)
    ds = read_sequences_jsonl(path)
    assert ds.count() == 2000
    # run the same check suite over the JSON-decoded batches
    vio = ds.map_batches(
        lambda b: _violation_pairs_batch(b, CheckContext()), batch_format="pyarrow", batch_size=4096
    ).to_pandas()
    gt = expected_violation_doc_rows(2000)
    docs = generate_sequences_table(2000, seed=42).column("doc_id").to_pylist()
    for check, rows in gt.items():
        if check == "doc_id_duplicates" or not rows:
            continue
        got = set(vio[vio.check_name == check].doc_id.dropna())
        exp = {docs[i] for i in rows if docs[i] is not None}
        assert got == exp, check


def test_jsonl_gz():
    from hepdata_validator_ray.sources.jsonl import ensure_sequences_jsonl, read_sequences_jsonl

    path = ensure_sequences_jsonl(SF, compress=True)
    ds = read_sequences_jsonl(path)
    assert ds.count() == 2000


def test_suite_config_local(tmp_path):
    from hepdata_validator_ray.sources.suite_loader import load_suite_config

    cfg = {
        "name": "strict_ids",
        "version": "1.1.1",
        "checks": ["doc_id_non_null", "doc_id_format"],
        "context": {"vocab_size": 1000, "sources": ["web"]},
    }
    p = tmp_path / "suite.json"
    p.write_text(json.dumps(cfg))
    suite, ctx = load_suite_config(str(p))
    assert [c.name for c in suite.checks] == ["doc_id_non_null", "doc_id_format"]
    assert ctx.vocab_size == 1000
    assert ctx.sources == ("web",)
    # registered (≙ load_custom_schema registry)
    from hepdata_validator_ray.checks.base import get_check_suite

    assert get_check_suite("strict_ids").name == "strict_ids"


def test_suite_config_extends_and_exclude(tmp_path):
    from hepdata_validator_ray.sources.suite_loader import load_suite_config

    parent = tmp_path / "parent.json"
    parent.write_text(json.dumps({"name": "parent", "checks": ["doc_id_non_null", "token_id_range"]}))
    child = tmp_path / "child.json"
    child.write_text(json.dumps({"name": "child", "extends": str(parent), "exclude": ["token_id_range"]}))
    suite, _ = load_suite_config(str(child))
    assert [c.name for c in suite.checks] == ["doc_id_non_null"]


def test_remote_autoload_refused():
    from hepdata_validator_ray.sources.suite_loader import RemoteSchemaNotAllowed, load_suite_config

    url = "https://example.org/schemas/my_schema.json"
    with pytest.raises(RemoteSchemaNotAllowed) as ei:
        load_suite_config(url, autoload_remote=False)
    # byte-matches full_submission_validator.py:340
    assert str(ei.value) == f"Autoloading of remote schema {url} is not allowed."


def test_remote_not_found():
    from hepdata_validator_ray.sources.suite_loader import RemoteSchemaNotFound, load_suite_config

    with pytest.raises(RemoteSchemaNotFound, match="not found"):
        load_suite_config("/nonexistent/suite.json")


def test_engine_with_custom_suite(tmp_path):
    """End-to-end: a custom suite validating only doc_id checks finds only
    doc_id violations."""
    import json as _json

    from hepdata_validator_ray.engine import ValidationConfig, ValidationEngine
    from hepdata_validator_ray.sources.suite_loader import load_suite_config
    from hepdata_validator_ray.synth import ensure_sequences_parquet, expected_violation_doc_rows

    p = ensure_sequences_parquet(SF, n_files=4)
    cfgp = tmp_path / "ids.json"
    cfgp.write_text(_json.dumps({"name": "ids_only", "checks": ["doc_id_non_null", "doc_id_format"]}))
    suite, _ = load_suite_config(str(cfgp))
    eng = ValidationEngine(ValidationConfig(suite=suite, enable_sketches=False, dup_check=False))
    res = eng.validate(p)
    gt = expected_violation_doc_rows(2000)
    assert res.violation_counts == {
        "doc_id_non_null": len(gt["doc_id_non_null"]),
        "doc_id_format": len(gt["doc_id_format"]),
    }


def test_csv_roundtrip_matches_parquet_checks():
    """CSV wire format parses back to the canonical schema; the check suite
    over CSV matches the parquet layout except empty-token rows (CSV cannot
    distinguish [] from NULL — documented wire-format limitation)."""
    from hepdata_validator_ray.sources.csv import ensure_sequences_csv, read_sequences_csv

    path = ensure_sequences_csv("/root/testdata/sf0.001")
    ds = read_sequences_csv(path)
    tbl = ds.take_batch(batch_size=2000, batch_format="pyarrow")
    assert tbl.column_names == ["doc_id", "tokens", "n_tok", "source"]
    assert tbl.num_rows == 2000
    assert str(tbl.schema.field("tokens").type) == "list<item: int32>"


def test_ipc_source_round_trip(ray_session):
    """The IPC mirror carries byte-identical rows to the parquet corpus
    and streams record batches (multi-batch files stay multi-block)."""
    import pandas as pd

    from hepdata_validator_ray.sources.ipc import ensure_sequences_ipc, read_sequences_ipc
    from hepdata_validator_ray.synth import ensure_sequences_parquet

    sf = "/root/testdata/sf0.001"
    pq_dir = ensure_sequences_parquet(sf)
    ipc_dir = ensure_sequences_ipc(sf)
    a = (
        read_sequences_ipc(ipc_dir)
        .to_pandas()
        .sort_values(["doc_id", "n_tok"], kind="mergesort")
        .reset_index(drop=True)
    )
    import ray.data

    b = (
        ray.data.read_parquet(pq_dir)
        .to_pandas()
        .sort_values(["doc_id", "n_tok"], kind="mergesort")
        .reset_index(drop=True)
    )
    assert len(a) == len(b) and list(a.columns) == list(b.columns)
    pd.testing.assert_frame_equal(
        a[["doc_id", "n_tok", "source"]], b[["doc_id", "n_tok", "source"]]
    )


def test_ipc_source_missing_dir_raises(tmp_path, ray_session):
    import pytest as _pytest

    from hepdata_validator_ray.sources.ipc import read_sequences_ipc

    with _pytest.raises(FileNotFoundError):
        read_sequences_ipc(str(tmp_path))
