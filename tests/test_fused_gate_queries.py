"""Tests for the round-3 fused gate queries: exact-dedup meta union,
brute+full-probe ANN union, and the langid+parity-fingerprint pass."""

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
DOCS = f"{SF}/documents.parquet"
EMB = f"{SF}/embeddings.parquet"


def test_exact_dedup_meta_matches_both_legs():
    from hepdata_validator_ray.pipelines.dedup import (
        exact_dedup_meta,
        exact_dup_groups,
        exact_keep_first,
    )

    meta = exact_dedup_meta(DOCS).to_pandas()
    # keep_first leg identical to the standalone query
    keep = (
        meta[meta["kind"] == "keep_first"][["h", "n"]]
        .rename(columns={"n": "keep_doc_id"})
        .sort_values("h")
        .reset_index(drop=True)
    )
    solo = exact_keep_first(DOCS).to_pandas().sort_values("h").reset_index(drop=True)
    pd.testing.assert_frame_equal(keep, solo.astype({"keep_doc_id": "int64"}))
    # summary leg identical to the standalone query
    summary = dict(zip(meta[meta["kind"] != "keep_first"]["kind"], meta[meta["kind"] != "keep_first"]["n"]))
    groups = exact_dup_groups(DOCS)
    assert summary == {
        "n_dup_groups": int(groups["n_dup_groups"].iloc[0]),
        "n_dup_docs": int(groups["n_dup_docs"].iloc[0]),
    }


def test_ann_meta_full_probe_ivf_equals_brute():
    from hepdata_validator_ray.pipelines.similarity import ann_meta

    out = ann_meta(EMB, k=5, n_queries=3, n_cells=8)
    brute = (
        out[out["method"] == "brute"]
        .drop(columns="method")
        .sort_values(["query_id", "neighbor_id"])
        .reset_index(drop=True)
    )
    ivf = (
        out[out["method"] == "ivf"]
        .drop(columns="method")
        .sort_values(["query_id", "neighbor_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(brute, ivf)
    assert set(out["method"]) == {"brute", "ivf"}


def test_fingerprint_parity_matches_duckdb_fold():
    from hepdata_validator_ray.pipelines.text import FP_PARITY_MOD, fingerprint_parity_words

    texts = ["the quick brown fox", "", "a", "der die das der die das", "x  y"]
    expected = [fingerprint_parity_words(t.split(" ")) for t in texts]
    con = duckdb.connect()
    got = [
        con.execute(
            """
            SELECT list_reduce(
                list_prepend(len(string_split(?, ' '))::BIGINT,
                             list_transform(string_split(?, ' '),
                                            x -> ('0x' || substr(md5(x), 1, 8))::BIGINT)),
                (a, b) -> (a * 31 + b) % """
            + str(FP_PARITY_MOD)
            + ")",
            [t, t],
        ).fetchone()[0]
        for t in texts
    ]
    assert got == expected


def test_fingerprint_parity_order_and_length_sensitive():
    from hepdata_validator_ray.pipelines.text import fingerprint_parity_words

    assert fingerprint_parity_words(["a", "b"]) != fingerprint_parity_words(["b", "a"])
    assert fingerprint_parity_words(["a"]) != fingerprint_parity_words(["a", "a"])
    assert fingerprint_parity_words([]) == 0  # empty fold = prepended length


def test_lang_fingerprint_stage_null_text():
    from hepdata_validator_ray.pipelines.text import LangFingerprintStage

    df = pd.DataFrame({"doc_id": [1, 2], "text": ["the and of the", None]})
    out = LangFingerprintStage()(df)
    assert list(out.columns) == ["doc_id", "pred_lang", "fingerprint"]
    assert out["pred_lang"].tolist()[0] == "en"
    assert out["fingerprint"].iloc[1] == -1
    assert out["fingerprint"].dtype == np.int64


def test_langid_oracle_sql_generated_from_tables():
    """The langid SQL must be derived from LANG_STOPWORDS (no drift)."""
    import __ray_entry__ as e

    sql = e.oracle_sql()["text_langid_fp"]
    from hepdata_validator_ray.pipelines.text import LANG_STOPWORDS

    for lang, words in LANG_STOPWORDS.items():
        assert f"s_{lang}" in sql
        for w in list(words)[:3]:
            assert f"'{w}'" in sql


def test_bm25_topk_matches_duckdb_and_orders_by_relevance():
    from hepdata_validator_ray.pipelines.retrieval import bm25_oracle_sql, bm25_topk

    terms = ["hash", "join"]
    got = bm25_topk(DOCS, terms, k=7)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{DOCS}')")
    want = con.execute(bm25_oracle_sql(terms, k=7)).df()
    pd.testing.assert_frame_equal(got.astype("int64"), want.astype("int64"))
    # every returned doc actually contains a query term (relevance sanity)
    assert (got["tf_total"] > 0).all()
    assert got["rank"].tolist() == list(range(1, len(got) + 1))


def test_bm25_stats_pass_is_tiny():
    from hepdata_validator_ray.pipelines.retrieval import bm25_corpus_stats

    n, sum_dl, df_t = bm25_corpus_stats(DOCS, ["hash", "nosuchword"])
    assert n > 0 and sum_dl > n  # multi-word docs
    assert df_t[0] > 0 and df_t[1] == 0


def test_bm25_empty_corpus(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hepdata_validator_ray.pipelines.retrieval import bm25_topk

    p = tmp_path / "empty.parquet"
    pq.write_table(
        pa.table({"doc_id": pa.array([], type=pa.int64()), "text": pa.array([], type=pa.string())}),
        p,
    )
    out = bm25_topk(str(p), ["x"], k=5)
    assert len(out) == 0 and list(out.columns) == ["rank", "doc_id", "dl", "tf_total"]


def test_ngram_dedup_meta_matches_both_legs():
    from hepdata_validator_ray.pipelines.dedup import (
        near_dup_clusters,
        ngram_dedup_meta,
        ngram_jaccard_pairs,
    )

    meta = ngram_dedup_meta(DOCS, threshold=0.3).to_pandas()
    pairs = (
        meta[meta["kind"] == "pair"][["a", "b", "jaccard"]]
        .rename(columns={"a": "doc_id_a", "b": "doc_id_b"})
        .sort_values(["doc_id_a", "doc_id_b"])
        .reset_index(drop=True)
    )
    solo_pairs = (
        ngram_jaccard_pairs(DOCS, threshold=0.3)
        .to_pandas()
        .astype({"doc_id_a": "int64", "doc_id_b": "int64"})
        .sort_values(["doc_id_a", "doc_id_b"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(pairs, solo_pairs)
    clusters = (
        meta[meta["kind"] == "cluster"][["a", "b"]]
        .rename(columns={"a": "doc_id", "b": "cluster_id"})
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    solo_cl = (
        near_dup_clusters(DOCS, threshold=0.3, method="ngram", distributed=True)
        .astype({"doc_id": "int64", "cluster_id": "int64"})
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(clusters, solo_cl)
    assert meta[meta["kind"] == "cluster"]["jaccard"].isna().all()


def test_null_and_exotic_whitespace_oracle_parity(tmp_path):
    """NULL text and non-ASCII whitespace must produce IDENTICAL rows from
    the Ray pipelines and their generated DuckDB oracles (review findings:
    NULL fell through the langid CASE to 'zh'; str.split() vs RE2 \\s+
    disagreed on NBSP; md5(NULL) vs '<NULL>' keys; NULL dl in BM25)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    import __ray_entry__ as e

    docs = tmp_path / "documents.parquet"
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4, 5], type=pa.int64()),
                "text": pa.array(
                    [
                        "the and of the hash",
                        None,
                        "a the join stream",  # NBSP inside a token pair
                        "der\tdie\ndas und ist",  # tabs/newlines split
                        "",
                    ],
                    type=pa.string(),
                ),
            }
        ),
        docs,
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{docs}')")
    oracles = e.oracle_sql()

    from hepdata_validator_ray.pipelines.dedup import exact_dedup_meta
    from hepdata_validator_ray.pipelines.retrieval import bm25_oracle_sql, bm25_topk
    from hepdata_validator_ray.pipelines.text import lang_fingerprint

    # langid + fingerprint
    got = (
        lang_fingerprint(str(docs)).to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    want = (
        con.execute(oracles["text_langid_fp"]).df().sort_values("doc_id").reset_index(drop=True)
    )
    assert got["pred_lang"].tolist() == want["pred_lang"].tolist()
    assert got["fingerprint"].astype("int64").tolist() == want["fingerprint"].astype("int64").tolist()
    assert got.loc[got.doc_id == 2, "pred_lang"].iloc[0] == "unknown"

    # exact dedup meta ('<NULL>' key parity); the gated query additionally
    # carries the CDC legs over the SEQUENCES table — not part of this
    # docs-only fixture, so strip them from the composed oracle here
    got = (
        exact_dedup_meta(str(docs)).to_pandas().sort_values(["kind", "h", "n"]).reset_index(drop=True)
    )
    want = (
        con.execute(oracles["dedup_exact_meta"]).df()
    )
    want = (
        want[~want["kind"].isin(["cdc_n", "cdc_dup"])]
        .sort_values(["kind", "h", "n"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got.astype({"n": "int64"}), want.astype({"n": "int64"}))
    assert "<NULL>" in set(got["h"])

    # bm25 (null text → dl 0, score 0, present in zero-score tail)
    terms = ["hash", "join", "stream"]
    got = bm25_topk(str(docs), terms, k=5)
    want = con.execute(bm25_oracle_sql(terms, k=5)).df()
    pd.testing.assert_frame_equal(got.astype("int64"), want.astype("int64"))


def test_events_range_join_half_open_window(tmp_path):
    """Window is [ts-60min, ts): a view exactly 60min before counts, a view
    at the same instant as the purchase does not."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hepdata_validator_ray.pipelines.relational import events_range_join

    ts = pd.to_datetime(
        [
            "2026-01-01 10:00:00",  # view  (exactly 60 min before -> counts)
            "2026-01-01 10:30:00",  # view  (inside -> counts)
            "2026-01-01 11:00:00",  # purchase @11:00
            "2026-01-01 11:00:00",  # view at the same instant -> excluded
            "2026-01-01 09:59:59",  # view just outside -> excluded
        ]
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([1, 2, 3, 4, 5], type=pa.int64()),
                "ts": pa.array(ts, type=pa.timestamp("us")),
                "user_id": pa.array([7, 7, 7, 7, 7], type=pa.int64()),
                "event_type": pa.array(["view", "view", "purchase", "view", "view"]),
            }
        ),
        d / "events.parquet",
    )
    out = events_range_join(str(d)).to_pandas()
    assert out.to_dict("records") == [{"event_id": 3, "n_in_window": 2}]


def test_lag_trailing_includes_range_join_column():
    from hepdata_validator_ray.pipelines.relational import events_lag_trailing, events_range_join

    fused = events_lag_trailing(SF).to_pandas()
    assert list(fused.columns) == [
        "event_id",
        "prev_ts",
        "n_trailing",
        "n_view_win",
        "run_cents",
        "run_n",
    ]
    solo = events_range_join(SF).to_pandas()
    m = fused.merge(solo, on="event_id")  # purchases only
    assert (m["n_view_win"] == m["n_in_window"]).all()


def test_events_tumbling_matches_duckdb():
    from hepdata_validator_ray.pipelines.relational import events_tumbling

    got = (
        events_tumbling(SF)
        .to_pandas()
        .sort_values("win_start")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')")
    want = con.execute(
        """
        SELECT strftime(make_timestamp((epoch_us(ts) // 3600000000) * 3600000000),
                        '%Y-%m-%d %H:%M:%S') AS win_start,
               count(*)::BIGINT AS n_events,
               count(DISTINCT user_id)::BIGINT AS n_users,
               sum(floor(value * 100)::BIGINT)::BIGINT AS sum_cents
        FROM events GROUP BY 1 ORDER BY 1
        """
    ).df()
    pd.testing.assert_frame_equal(got, want)
    assert (got["n_users"] <= got["n_events"]).all()


def test_normalize_texts_kernel_and_oracle_parity(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    import __ray_entry__ as e
    from hepdata_validator_ray.pipelines.text import normalize_texts

    docs = tmp_path / "documents.parquet"
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
                "text": pa.array(
                    ["  Hello, World!!  How are  you?  ", None, "a\tb\nc", "..."],
                    type=pa.string(),
                ),
            }
        ),
        docs,
    )
    got = normalize_texts(str(docs)).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert got["norm_text"].tolist()[0] == "hello world how are you"
    assert got["norm_text"].tolist()[2] == "a b c"
    assert got["norm_text"].tolist()[3] == ""
    assert pd.isna(got["norm_text"].iloc[1])
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{docs}')")
    want = con.execute(e.oracle_sql()["text_normalize"]).df().sort_values("doc_id").reset_index(drop=True)
    assert got["norm_text"].where(got["norm_text"].notna(), None).tolist() == \
        want["norm_text"].where(want["norm_text"].notna(), None).tolist()
    g_removed = [None if pd.isna(x) else float(x) for x in got["n_removed_chars"]]
    w_removed = [None if pd.isna(x) else float(x) for x in want["n_removed_chars"]]
    assert g_removed == w_removed


def test_profile_table_typed_extrema_and_nulls(tmp_path):
    """Numeric extrema must reduce numerically across batch partials
    (lexical min('10','9') would be '10'); nulls are excluded from
    distinct/extrema but counted."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hepdata_validator_ray.pipelines.profile import profile_oracle_sql, profile_table

    docs = tmp_path / "t.parquet"
    pq.write_table(
        pa.table(
            {
                "a": pa.array([9, 10, 1000, None, -5], type=pa.int64()),
                "b": pa.array(["z", None, "a", "a", None], type=pa.string()),
            }
        ),
        docs,
    )
    got = profile_table(str(docs)).sort_values("column").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW t AS SELECT * FROM read_parquet('{docs}')")
    want = (
        con.execute(profile_oracle_sql("t", ["a", "b"]))
        .df()
        .sort_values("column")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
    a = got[got["column"] == "a"].iloc[0]
    assert (a["min_v"], a["max_v"], a["n_nulls"], a["n_distinct"]) == ("-5", "1000", 1, 4)


def _oracle_df(name: str, sf: str = SF) -> pd.DataFrame:
    """Run the committed oracle_sql() entry for `name` against sf's tables."""
    import __ray_entry__ as e

    con = duckdb.connect()
    for t in ("events", "documents"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    return con.execute(e.oracle_sql()[name]).df()


def test_events_hopping_matches_duckdb():
    from hepdata_validator_ray.pipelines.relational import events_hopping

    got = events_hopping(SF).to_pandas().sort_values("win_start").reset_index(drop=True)
    want = _oracle_df("events_hopping").sort_values("win_start").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    # every event is replicated into exactly window/hop = 2 windows
    n_events = duckdb.sql(f"SELECT count(*) FROM read_parquet('{SF}/events.parquet')").fetchone()[0]
    assert int(got["n_events"].sum()) == 2 * n_events


def test_events_hopping_window_membership(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hepdata_validator_ray.pipelines.relational import events_hopping

    d = tmp_path
    # one event at 00:45 → 60min/30min-hop windows starting 00:00 and 00:30
    pq.write_table(
        pa.table(
            {
                "ts": pa.array([pd.Timestamp("2024-01-01 00:45:00")], type=pa.timestamp("us")),
                "user_id": pa.array([7], type=pa.int64()),
                "value": pa.array([1.25], type=pa.float64()),
            }
        ),
        d / "events.parquet",
    )
    out = events_hopping(str(d)).to_pandas().sort_values("win_start").reset_index(drop=True)
    assert out.to_dict("records") == [
        {"win_start": "2024-01-01 00:00:00", "n_events": 1, "n_users": 1, "sum_cents": 125},
        {"win_start": "2024-01-01 00:30:00", "n_events": 1, "n_users": 1, "sum_cents": 125},
    ]


def test_events_hopping_rejects_non_multiple():
    from hepdata_validator_ray.pipelines.relational import events_hopping

    with pytest.raises(ValueError):
        events_hopping(SF, window_minutes=50, hop_minutes=30)


def test_events_props_stats_matches_duckdb():
    from hepdata_validator_ray.pipelines.relational import events_props_stats

    got = events_props_stats(SF).to_pandas().sort_values("event_type").reset_index(drop=True)
    want = _oracle_df("events_props_stats").sort_values("event_type").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_events_props_stats_null_and_malformed(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hepdata_validator_ray.pipelines.relational import events_props_stats

    d = tmp_path
    pq.write_table(
        pa.table(
            {
                "event_type": pa.array(["a", "a", "a", "a", "b"]),
                "props": pa.array(['{"k": 3}', None, "not json", '{"k": "str"}', '{"j": 1, "k": -2}']),
            }
        ),
        d / "events.parquet",
    )
    out = (
        events_props_stats(str(d)).to_pandas().sort_values("event_type").reset_index(drop=True)
    )
    a = out[out["event_type"] == "a"].iloc[0]
    assert (a["n_events"], a["n_null"], a["sum_k"], a["min_k"], a["max_k"]) == (4, 3, 3, 3, 3)
    b = out[out["event_type"] == "b"].iloc[0]
    # mid-object key ("," prefix) extracts; negative ints extract
    assert (b["n_events"], b["n_null"], b["sum_k"]) == (1, 0, -2)


def test_docs_rollup_matches_duckdb():
    from hepdata_validator_ray.pipelines.relational import docs_rollup_stats

    got = (
        docs_rollup_stats(SF)
        .to_pandas()
        .sort_values(["source", "lang"])
        .reset_index(drop=True)
    )
    want = _oracle_df("docs_rollup").sort_values(["source", "lang"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    # invariants: grand total row equals the sum of the finest level
    fin = got[(got["source"] != "<ALL>") & (got["lang"] != "<ALL>")]
    tot = got[(got["source"] == "<ALL>") & (got["lang"] == "<ALL>")].iloc[0]
    assert int(fin["n_docs"].sum()) == int(tot["n_docs"])
    assert int(fin["sum_chars"].sum()) == int(tot["sum_chars"])


def test_docs_rollup_null_group_sentinel(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hepdata_validator_ray.pipelines.relational import docs_rollup_stats

    d = tmp_path
    pq.write_table(
        pa.table(
            {
                "source": pa.array(["s", None]),
                "lang": pa.array([None, "en"]),
                "n_chars": pa.array([10, None], type=pa.int64()),
            }
        ),
        d / "documents.parquet",
    )
    out = docs_rollup_stats(str(d)).to_pandas()
    rows = {(r["source"], r["lang"]): (r["n_docs"], r["sum_chars"]) for _, r in out.iterrows()}
    # real NULLs stay distinguishable from the rollup marker
    assert rows[("s", "<NULL>")] == (1, 10)
    assert rows[("<NULL>", "en")] == (1, 0)
    assert rows[("s", "<ALL>")] == (1, 10)
    assert rows[("<NULL>", "<ALL>")] == (1, 0)
    assert rows[("<ALL>", "<ALL>")] == (2, 10)


def test_events_daily_pivot_matches_duckdb():
    from hepdata_validator_ray.pipelines.relational import events_daily_pivot

    got = events_daily_pivot(SF).to_pandas().sort_values("day").reset_index(drop=True)
    want = _oracle_df("events_daily_pivot").sort_values("day").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[sorted(got.columns)], want[sorted(want.columns)])
    # wide counts reconcile with the long-form daily rollup
    n_events = duckdb.sql(f"SELECT count(*) FROM read_parquet('{SF}/events.parquet')").fetchone()[0]
    count_cols = [c for c in got.columns if c != "day"]
    assert int(got[count_cols].to_numpy().sum()) == n_events


def test_events_daily_pivot_other_and_null(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hepdata_validator_ray.pipelines.relational import events_daily_pivot

    d = tmp_path
    pq.write_table(
        pa.table(
            {
                "ts": pa.array(
                    [pd.Timestamp("2024-01-01 03:00:00")] * 4, type=pa.timestamp("us")
                ),
                "event_type": pa.array(["view", "weird", None, "view"]),
            }
        ),
        d / "events.parquet",
    )
    out = events_daily_pivot(str(d)).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["day"], r["n_view"], r["n_other"], r["n_click"]) == ("2024-01-01", 2, 2, 0)


def test_docs_lang_mode_matches_duckdb():
    from hepdata_validator_ray.pipelines.relational import docs_lang_mode

    got = docs_lang_mode(SF).to_pandas().sort_values("source").reset_index(drop=True)
    want = _oracle_df("docs_lang_mode").sort_values("source").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_docs_lang_mode_tie_break(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hepdata_validator_ray.pipelines.relational import docs_lang_mode

    d = tmp_path
    # source s: en x2, de x2 (tie -> 'de' wins lexically); t: NULL lang mode
    pq.write_table(
        pa.table(
            {
                "source": pa.array(["s", "s", "s", "s", "t", "t", "t"]),
                "lang": pa.array(["en", "de", "en", "de", None, None, "fr"]),
            }
        ),
        d / "documents.parquet",
    )
    out = docs_lang_mode(str(d)).to_pandas().sort_values("source").reset_index(drop=True)
    assert out.to_dict("records") == [
        {"source": "s", "mode_lang": "de", "n_docs": 2},
        {"source": "t", "mode_lang": "<NULL>", "n_docs": 2},
    ]


def test_docs_cube_matches_duckdb():
    from hepdata_validator_ray.pipelines.relational import docs_rollup_stats

    got = (
        docs_rollup_stats(SF, grouping="cube")
        .to_pandas()
        .sort_values(["source", "lang"])
        .reset_index(drop=True)
    )
    want = _oracle_df("docs_cube").sort_values(["source", "lang"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    # cube = rollup + the (<ALL>, lang) slice
    roll = docs_rollup_stats(SF).to_pandas()
    assert len(got) == len(roll) + got[(got["source"] == "<ALL>") & (got["lang"] != "<ALL>")].shape[0]
    with pytest.raises(ValueError):
        docs_rollup_stats(SF, grouping="nope")


def test_docs_ntile_matches_duckdb():
    from hepdata_validator_ray.pipelines.relational import docs_ntile

    got = docs_ntile(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    want = _oracle_df("docs_ntile").sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[sorted(got.columns)], want[sorted(want.columns)])


def test_docs_ntile_distribution(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hepdata_validator_ray.pipelines.relational import docs_ntile

    d = tmp_path
    # source s: 6 docs over 4 tiles -> sizes 2,2,1,1; source t: 2 docs < n
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(list(range(1, 9)), type=pa.int64()),
                "source": pa.array(["s"] * 6 + ["t"] * 2),
                "n_chars": pa.array([10, 20, 30, 40, 50, 60, 5, None], type=pa.int64()),
            }
        ),
        d / "documents.parquet",
    )
    out = docs_ntile(str(d), n=4).to_pandas().sort_values("doc_id").reset_index(drop=True)
    s = out[out["source"] == "s"]["tile"].tolist()
    assert s == [1, 1, 2, 2, 3, 4]  # first cnt%n tiles get the extra row
    t = dict(zip(out[out["source"] == "t"]["doc_id"], out[out["source"] == "t"]["tile"]))
    # NULL n_chars coalesces to 0 -> doc 8 sorts before doc 7
    assert t == {8: 1, 7: 2}


def test_events_value_corr_matches_duckdb():
    from hepdata_validator_ray.pipelines.relational import events_value_corr

    got = events_value_corr(SF).to_pandas().sort_values("event_type").reset_index(drop=True)
    want = _oracle_df("events_value_corr").sort_values("event_type").reset_index(drop=True)
    # bit-identical doubles is the contract (identical parenthesization
    # over identical integer sums) — not just approx equality
    pd.testing.assert_frame_equal(got, want, check_exact=True)
    assert got["corr"].abs().max() <= 1.0 + 1e-12


def test_events_value_corr_degenerate_and_nulls(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hepdata_validator_ray.pipelines.relational import events_value_corr

    d = tmp_path
    pq.write_table(
        pa.table(
            {
                "event_type": pa.array(["a", "a", "a", "b", "b", "c"]),
                # a: perfectly linear (corr=1); b: zero x-variance -> NULL;
                # c: NULL props excluded -> no pairs -> absent
                "value": pa.array([1.0, 2.0, 3.0, 5.0, 5.0, 9.0], type=pa.float64()),
                "props": pa.array(
                    ['{"k": 10}', '{"k": 20}', '{"k": 30}', '{"k": 1}', '{"k": 2}', None]
                ),
            }
        ),
        d / "events.parquet",
    )
    out = events_value_corr(str(d)).to_pandas().set_index("event_type")
    assert out.loc["a", "n_pairs"] == 3 and out.loc["a", "corr"] == pytest.approx(1.0)
    assert out.loc["b", "n_pairs"] == 2 and pd.isna(out.loc["b", "corr"])
    assert "c" not in out.index


def test_events_value_moments_matches_duckdb():
    from hepdata_validator_ray.pipelines.relational import events_value_moments

    got = events_value_moments(SF).to_pandas().sort_values("event_type").reset_index(drop=True)
    want = _oracle_df("events_value_moments").sort_values("event_type").reset_index(drop=True)
    # bit-identical doubles: identical parenthesization over identical
    # integer power sums (NOT DuckDB's skewness()/kurtosis(), whose internal
    # accumulation isn't reproducible from sufficient statistics)
    pd.testing.assert_frame_equal(got, want, check_exact=True)


def test_events_value_moments_degenerate(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hepdata_validator_ray.pipelines.relational import events_value_moments

    d = tmp_path
    pq.write_table(
        pa.table(
            {
                "event_type": pa.array(["a"] * 5 + ["b", "b", "c", "d"]),
                "value": pa.array([1.0] * 9, type=pa.float64()),
                # a: right-skewed sample; b: zero variance -> NULLs;
                # c: single value -> vn = 0 -> NULLs; d: unparseable props
                "props": pa.array(
                    ['{"k": 0}', '{"k": 0}', '{"k": 1}', '{"k": 1}', '{"k": 10}',
                     '{"k": 7}', '{"k": 7}', '{"k": 3}', "not json"]
                ),
            }
        ),
        d / "events.parquet",
    )
    out = events_value_moments(str(d)).to_pandas().set_index("event_type")
    assert out.loc["a", "n_vals"] == 5 and out.loc["a", "skew_pop"] > 1.0
    assert out.loc["b", "n_vals"] == 2 and pd.isna(out.loc["b", "skew_pop"])
    assert pd.isna(out.loc["b", "kurt_pop"])
    assert out.loc["c", "n_vals"] == 1 and pd.isna(out.loc["c", "kurt_pop"])
    assert "d" not in out.index
    # scipy-free sanity: population skew/kurt of a's sample via numpy
    import numpy as np

    k = np.array([0.0, 0.0, 1.0, 1.0, 10.0])
    m = k.mean()
    m2 = ((k - m) ** 2).mean()
    assert out.loc["a", "skew_pop"] == pytest.approx(((k - m) ** 3).mean() / m2**1.5)
    assert out.loc["a", "kurt_pop"] == pytest.approx(((k - m) ** 4).mean() / m2**2 - 3.0)


def test_docs_rank_windows_matches_duckdb():
    from hepdata_validator_ray.pipelines.relational import docs_rank_windows

    got = docs_rank_windows(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    want = _oracle_df("docs_rank_windows").sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_exact=True)


def test_docs_rank_windows_ties_and_single_row(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hepdata_validator_ray.pipelines.relational import docs_rank_windows

    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4, 5], type=pa.int64()),
                "source": pa.array(["a", "a", "a", "a", "b"]),
                # a: 5,5,3,1 (tie at top); b: single row
                "n_chars": pa.array([5, 5, 3, 1, 9], type=pa.int64()),
            }
        ),
        tmp_path / "documents.parquet",
    )
    out = docs_rank_windows(str(tmp_path)).to_pandas().set_index("doc_id")
    assert out.loc[1, "rn"] == 1 and out.loc[2, "rn"] == 2  # doc_id tie-break
    assert out.loc[1, "rnk"] == 1 and out.loc[2, "rnk"] == 1  # peers share rank
    assert out.loc[3, "rnk"] == 3 and out.loc[3, "drnk"] == 2  # rank gaps, dense doesn't
    assert out.loc[1, "pr"] == 0.0 and out.loc[4, "pr"] == 1.0
    assert out.loc[1, "cd"] == 0.5  # two peers of four rows
    assert out.loc[5, "pr"] == 0.0 and out.loc[5, "cd"] == 1.0  # single-row partition


def test_events_daily_unpivot_matches_duckdb():
    from hepdata_validator_ray.pipelines.relational import events_daily_unpivot

    got = (
        events_daily_unpivot(SF)
        .to_pandas()
        .sort_values(["day", "event_type"])
        .reset_index(drop=True)
    )
    want = _oracle_df("events_daily_unpivot").sort_values(["day", "event_type"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_events_daily_unpivot_other_fold(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hepdata_validator_ray.pipelines.relational import events_daily_unpivot

    d = tmp_path
    pq.write_table(
        pa.table(
            {
                "ts": pa.array([pd.Timestamp("2024-01-01 03:00:00")] * 3, type=pa.timestamp("us")),
                "event_type": pa.array(["view", "weird", None]),
            }
        ),
        d / "events.parquet",
    )
    out = events_daily_unpivot(str(d)).to_pandas().sort_values("event_type").reset_index(drop=True)
    # zero-count types are dropped; weird + NULL fold into <OTHER>
    assert out.to_dict("records") == [
        {"day": "2024-01-01", "event_type": "<OTHER>", "n_events": 2},
        {"day": "2024-01-01", "event_type": "view", "n_events": 1},
    ]


def test_pivot_hot_day_skew(tmp_path):
    """Single hot key: 200k events all on one day must still produce one
    correct wide row (map-side bincount collapses each batch before the
    exchange, so the hot day's shuffle traffic is |batches| rows)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hepdata_validator_ray.pipelines.relational import events_daily_pivot

    n = 200_000
    rng = np.random.default_rng(7)
    types = np.asarray(["click", "view", "purchase", "weird"], dtype=object)
    et = types[rng.integers(0, 4, n)]
    d = tmp_path
    pq.write_table(
        pa.table(
            {
                "ts": pa.array(
                    np.full(n, np.datetime64("2024-06-01T12:00:00", "us"))
                ),
                "event_type": pa.array(et),
            }
        ),
        d / "events.parquet",
    )
    out = events_daily_pivot(str(d)).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert r["day"] == "2024-06-01"
    assert int(r["n_click"]) == int((et == "click").sum())
    assert int(r["n_other"]) == int((et == "weird").sum())
    assert int(r[[c for c in out.columns if c != "day"]].sum()) == n


def test_events_value_regression_matches_duckdb():
    from hepdata_validator_ray.pipelines.relational import events_value_regression

    got = events_value_regression(SF).to_pandas().sort_values("event_type").reset_index(drop=True)
    want = _oracle_df("events_value_regression").sort_values("event_type").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_exact=True)


def test_events_value_regression_exact_line(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hepdata_validator_ray.pipelines.relational import events_value_regression

    d = tmp_path
    # y = 2x + 5 exactly in cents space: x=100,200,300 cents; k=205,405,605
    pq.write_table(
        pa.table(
            {
                "event_type": pa.array(["a"] * 3 + ["b"] * 2),
                "value": pa.array([1.0, 2.0, 3.0, 4.0, 4.0], type=pa.float64()),
                "props": pa.array(
                    ['{"k": 205}', '{"k": 405}', '{"k": 605}', '{"k": 1}', '{"k": 9}']
                ),
            }
        ),
        d / "events.parquet",
    )
    out = events_value_regression(str(d)).to_pandas().set_index("event_type")
    assert out.loc["a", "slope"] == pytest.approx(2.0)
    assert out.loc["a", "intercept"] == pytest.approx(5.0)
    # zero x-variance -> NULL slope and intercept
    assert pd.isna(out.loc["b", "slope"]) and pd.isna(out.loc["b", "intercept"])


def test_relational_meta_union_legs_match_standalone():
    import __ray_entry__ as e
    from hepdata_validator_ray.pipelines.relational import (
        docs_rollup_stats,
        events_hopping,
        events_props_stats,
    )

    meta = e.queries()["relational_meta"](SF)
    hop = meta[meta["kind"] == "hopping"]
    solo = events_hopping(SF).to_pandas()
    assert len(hop) == len(solo)
    assert int(hop["a"].sum()) == int(solo["n_events"].sum())
    pr = meta[meta["kind"] == "props"].set_index("gkey")
    solo_pr = events_props_stats(SF).to_pandas().set_index("event_type")
    assert (pr["a"] == solo_pr["n_events"]).all()
    assert (pr["c"].astype("int64") == solo_pr["sum_k"].astype("int64")).all()
    ro = meta[meta["kind"] == "rollup"]
    solo_ro = docs_rollup_stats(SF).to_pandas()
    assert len(ro) == len(solo_ro)
    assert int(ro[ro["gkey"] == "<ALL>|<ALL>"]["a"].iloc[0]) == int(
        solo_ro[(solo_ro["source"] == "<ALL>") & (solo_ro["lang"] == "<ALL>")]["n_docs"].iloc[0]
    )


def test_relational_meta2_union_legs_match_standalone():
    import __ray_entry__ as e
    from hepdata_validator_ray.pipelines.relational import (
        docs_quantile_disc,
        events_funnel,
        events_type_transitions,
    )

    meta = e.queries()["relational_meta2"](SF)
    fu = meta[meta["kind"] == "funnel"].sort_values("k2")
    solo_fu = events_funnel(SF).to_pandas().sort_values("step")
    assert fu["a"].tolist() == solo_fu["n_users"].tolist()
    assert fu["gkey"].tolist() == solo_fu["event_type"].tolist()
    pct = meta[meta["kind"] == "pct"]
    solo_q = docs_quantile_disc(SF).to_pandas().set_index("source")
    assert len(pct) == 4 * len(solo_q)
    p50 = pct[pct["k2"] == 50].set_index("gkey")["a"]
    assert (p50 == solo_q["q50"]).all()
    tr = meta[meta["kind"] == "trans"]
    solo_tr = events_type_transitions(SF).to_pandas()
    assert len(tr) == len(solo_tr)
    assert int(tr["a"].sum()) == int(solo_tr["n"].sum())
