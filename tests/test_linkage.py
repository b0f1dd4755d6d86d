"""Blocked edit-distance record linkage (dedup.edit_distance_links):
the batched-DP Levenshtein kernel must be cell-exact vs DuckDB's native
levenshtein(), and the blocking join must isolate blocks (source + text
prefix) and honour the distance threshold."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from hepdata_validator_ray.pipelines.dedup import _levenshtein_batch, edit_distance_links


def test_levenshtein_batch_vs_duckdb():
    """Exact parity with DuckDB's levenshtein() over random ASCII pairs at
    every length 0..width, including empty strings and full-width strings."""
    rng = np.random.default_rng(7)
    width = 16
    alphabet = list("abcde XYZ[]12")
    pairs = []
    for _ in range(300):
        la, lb = rng.integers(0, width + 1, size=2)
        pairs.append(
            (
                "".join(rng.choice(alphabet, size=la)),
                "".join(rng.choice(alphabet, size=lb)),
            )
        )
    # pinned boundary cases on top of the random sweep
    pairs += [("", ""), ("", "abcd"), ("abcd", ""), ("a" * width, "a" * width), ("a" * width, "b" * width)]
    a = pd.Series([p[0] for p in pairs])
    b = pd.Series([p[1] for p in pairs])
    got = _levenshtein_batch(a, b, width)
    con = duckdb.connect()
    want = con.execute(
        "SELECT levenshtein(a, b) AS d FROM (SELECT unnest($1::VARCHAR[]) AS a, unnest($2::VARCHAR[]) AS b)",
        [list(a), list(b)],
    ).fetchnumpy()["d"]
    assert np.array_equal(got, want.astype(np.int64))


def _write_docs(path, rows):
    t = pa.Table.from_pandas(
        pd.DataFrame(rows, columns=["doc_id", "source", "text"]).assign(
            doc_id=lambda d: d["doc_id"].astype("int64")
        ),
        preserve_index=False,
    )
    pq.write_table(t, path)
    return str(path)


def test_edit_distance_links_blocking_and_threshold(tmp_path):
    """Crafted two-crawl fixture: identical docs link at dist 0, appended
    suffixes link with the exact distance, same-prefix/different-source
    pairs stay unlinked (block isolation), different prefixes stay
    unlinked, and distances past max_dist are cut."""
    base_text = "the quick brown fox jumps over the lazy dog"
    base = _write_docs(
        tmp_path / "base.parquet",
        [
            (1, "web", base_text),          # unchanged -> dist 0 self-link
            (2, "web", base_text + " two"), # edited in crawl 2 -> small dist
            (3, "pdf", base_text),          # same text, source pdf
            (4, "web", "zzz totally different prefix here"),
            (5, "web", None),               # NULL text -> empty, blocks alone
        ],
    )
    new = _write_docs(
        tmp_path / "new.parquet",
        [
            (1, "web", base_text),
            (2, "web", base_text + " two [rev2]"),   # append -> prefix survives
            (3, "web", base_text),                   # source flipped: must NOT link to base 3
            (6, "web", base_text + " unrelated tail that is very long and different"),
        ],
    )
    got = (
        edit_distance_links(base, new, max_dist=14, block_prefix=16, window=16, num_buckets=4)
        .to_pandas()
        .sort_values(["doc_id_a", "doc_id_b"])
        .reset_index(drop=True)
    )
    # expected via the same blocking rule + DuckDB levenshtein
    con = duckdb.connect()
    want = con.execute(
        f"""
        WITH o AS (SELECT doc_id, coalesce(source,'') || '|' || substr(coalesce(text,''),1,16) AS bk,
                          right(coalesce(text,''),16) AS sfx FROM read_parquet('{base}')),
             n AS (SELECT doc_id, coalesce(source,'') || '|' || substr(coalesce(text,''),1,16) AS bk,
                          right(coalesce(text,''),16) AS sfx FROM read_parquet('{new}'))
        SELECT o.doc_id AS doc_id_a, n.doc_id AS doc_id_b, levenshtein(o.sfx, n.sfx)::BIGINT AS dist
        FROM o JOIN n ON o.bk = n.bk WHERE levenshtein(o.sfx, n.sfx) <= 14
        ORDER BY doc_id_a, doc_id_b
        """
    ).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # semantic pins independent of the oracle expression
    links = set(zip(got["doc_id_a"], got["doc_id_b"]))
    assert (1, 1) in links and int(got.set_index(["doc_id_a", "doc_id_b"]).loc[(1, 1), "dist"]) == 0
    # " [rev2]" append shifts the 16-char suffix window -> dist 14 (the
    # production threshold exists precisely to admit this class of edit)
    assert (2, 2) in links and int(got.set_index(["doc_id_a", "doc_id_b"]).loc[(2, 2), "dist"]) == 14
    assert (3, 3) not in links  # block isolation: source differs
    assert all(a != 4 and a != 5 for a, _ in links)  # different prefix / NULL text block alone
    assert (1, 6) not in links  # long different tail: dist 15 > max_dist cut
