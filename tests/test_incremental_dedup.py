"""Incremental (delta) MinHash dedup of a new snapshot against a
reference corpus: flag semantics, min-ref rule, both attach paths,
and the exact-Jaccard DuckDB oracle."""

import pandas as pd
import ray.data as rd

BASE = ("the quick brown fox jumps over the lazy dog while rain "
        "falls gently on the quiet green meadow near the old barn")
OTHER = ("stock markets rallied sharply today as investors cheered "
         "strong earnings reports from major technology companies")
THIRD = ("recipes for winter soups include lentils carrots onions "
         "garlic thyme and a generous pinch of smoked paprika")


def _ref():
    return pd.DataFrame({
        "doc_id": [2, 4, 6],
        "text": [BASE, OTHER, THIRD],
    })


def _new():
    return pd.DataFrame({
        "doc_id": [101, 103, 105],
        "text": [
            BASE + " extra",                  # near-dup of 2
            "completely novel content about deep sea bioluminescent "
            "creatures drifting through the midnight zone",
            OTHER,                            # exact copy of 4
        ],
    })


def _run(**kw):
    from pdf2dom_ray.functions.dedup import incremental_dedup
    out = incremental_dedup(rd.from_pandas(_new()),
                            rd.from_pandas(_ref()), **kw) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    return out


def test_flag_semantics_broadcast(ray_session):
    got = _run()
    assert list(got["doc_id"]) == [101, 103, 105]
    assert list(got["dup_of"]) == [2, -1, 4]
    assert list(got["is_new"]) == [False, True, False]


def test_join_path_identical(ray_session):
    a = _run()
    b = _run(broadcast_limit=0)
    pd.testing.assert_frame_equal(a, b, check_like=True)


def test_min_ref_rule(ray_session):
    # the new doc collides with refs 2 AND 8 (both copies of BASE):
    # dup_of must be the smaller ref id
    from pdf2dom_ray.functions.dedup import incremental_dedup
    ref = pd.DataFrame({"doc_id": [8, 2], "text": [BASE, BASE]})
    new = pd.DataFrame({"doc_id": [50], "text": [BASE + " tail"]})
    got = incremental_dedup(rd.from_pandas(new),
                            rd.from_pandas(ref)).to_pandas()
    assert list(got["dup_of"]) == [2]


def test_oracle_exact_jaccard_agrees(ray_session):
    import duckdb
    con = duckdb.connect()
    con.register("refs", _ref())
    con.register("news", _new())
    ora = con.execute("""
        WITH u AS (SELECT * FROM refs UNION ALL SELECT * FROM news),
        w AS (SELECT doc_id, text, string_split(text,' ') AS w FROM u),
        sh AS (SELECT doc_id, CASE WHEN len(w) < 3 THEN [text]
                 ELSE list_distinct(list_transform(
                        generate_series(1, len(w)-2),
                        i -> w[i]||' '||w[i+1]||' '||w[i+2])) END AS s
               FROM w),
        best AS (SELECT b.doc_id, MIN(a.doc_id) AS dup_of
                 FROM sh a JOIN sh b
                   ON a.doc_id < 100 AND b.doc_id >= 100
                 WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                   / (len(a.s)+len(b.s)-len(list_intersect(a.s, b.s)))
                   > 0.5
                 GROUP BY b.doc_id)
        SELECT n.doc_id, COALESCE(best.dup_of, -1) AS dup_of,
               best.dup_of IS NULL AS is_new
        FROM news n LEFT JOIN best USING (doc_id)
        ORDER BY n.doc_id""").df()
    got = _run()
    for c in ("doc_id", "dup_of", "is_new"):
        assert list(got[c]) == list(ora[c]), c
