"""MinHash estimation-error audit: estimated vs exact Jaccard per
LSH candidate pair.

The confidence instrument for the dedup family (Broder '97 resemblance
estimation): for every pair of documents that collides in at least one
LSH band, report the signature-based Jaccard ESTIMATE (matching
permutations / H) next to the EXACT integer Jaccard over the distinct
shingle-hash sets, and their absolute error — the number that tells
you whether `num_perm`/`bands` are sized right for a corpus before
trusting `minhash_cluster` on 100 TB of it.

Everything is SQL-replayable (unlike the production `dedup.py` signer,
whose crc32/numpy permutations DuckDB cannot evaluate): shingle hashes
are md5-prefix 32-bit ints (the repo's sampling.py idiom) and the H
permutations ``(a_i·h + b_i) mod (2^61 - 1)`` use a < 2^30 seeded
constants embedded into the oracle as a VALUES list, so a·h + b stays
below 2^62 on BOTH numpy int64 and DuckDB BIGINT. All outputs are
exact integers (CLAUDE.md oracle rule).

Scale shape: per-batch signatures (vectorized perms × shingles) → one
(band, key) hash-partition exchange emits colliding pairs partition-
locally → one pair-keyed exchange dedups across bands → two
``join_ready`` narrow joins re-attach each side's signature + shingle
set (both lists, ~1 KB/doc) → vectorized per-pair scoring. Candidate
pairs are the POST-LSH set — tiny relative to the corpus by LSH
design; nothing quadratic in N ever materializes.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

__all__ = ["minhash_audit", "minhash_audit_oracle_sql",
           "AUDIT_NUM_PERM", "AUDIT_BANDS"]

_P = (1 << 61) - 1
AUDIT_NUM_PERM = 32
AUDIT_BANDS = 8
_R = AUDIT_NUM_PERM // AUDIT_BANDS


def _perm_consts() -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(11)
    a = rng.integers(1, 1 << 30, AUDIT_NUM_PERM, dtype=np.int64)
    b = rng.integers(0, 1 << 30, AUDIT_NUM_PERM, dtype=np.int64)
    return a, b


def _shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    ws = [x for x in (text or "").split(" ") if x]
    if len(ws) >= k:
        grams = {" ".join(ws[i:i + k]) for i in range(len(ws) - k + 1)}
    elif ws:
        grams = {text}
    else:
        return np.empty(0, dtype=np.int64)
    return np.unique(np.array(
        [int(hashlib.md5(g.encode("utf-8")).hexdigest()[:8], 16)
         for g in grams], dtype=np.int64))


def minhash_audit(ds: rd.Dataset, *, text_col: str = "text",
                  id_col: str = "doc_id",
                  num_partitions: int | None = None) -> rd.Dataset:
    """(doc_a, doc_b, n_match, est_ppm, jac_ppm, err_ppm) for every
    pair sharing ≥ 1 of the ``AUDIT_BANDS`` signature bands."""
    from ..scale import scale_partitions
    from .dedup import _to_arrow_blocks, join_ready

    n_part = num_partitions or scale_partitions()
    a_c, b_c = _perm_consts()

    def sign(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_pylist()
        texts = t.column(text_col).to_pylist()
        out_id, out_sig, out_sh = [], [], []
        for did, text in zip(ids, texts):
            sh = _shingle_hashes(text)
            if not len(sh):
                continue
            sig = ((a_c[:, None] * sh[None, :] + b_c[:, None])
                   % _P).min(axis=1)
            out_id.append(did)
            # int64-LE byte packing: Ray's hash join rejects list /
            # tensor payload columns, binary passes through
            out_sig.append(sig.astype("<i8").tobytes())
            out_sh.append(sh.astype("<i8").tobytes())
        return pa.table({
            "doc_id": pa.array(out_id, pa.int64()),
            "sig": pa.array(out_sig, pa.binary()),
            "sh": pa.array(out_sh, pa.binary())})

    docs = _to_arrow_blocks(
        ds.map_batches(sign, batch_format="pyarrow")).materialize()

    def band_rows(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        sigs = t.column("sig").to_pylist()
        out_id, out_band, out_key = [], [], []
        for did, raw in zip(ids, sigs):
            sig = np.frombuffer(raw, dtype="<i8")
            for b in range(AUDIT_BANDS):
                key = ":".join(str(v)
                               for v in sig[b * _R:(b + 1) * _R])
                out_id.append(did)
                out_band.append(b)
                out_key.append(key)
        return pa.table({
            "doc_id": pa.array(out_id, pa.int64()),
            "band": pa.array(out_band, pa.int32()),
            "key": pa.array(out_key, pa.string())})

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(df[["band", "key"]],
                                       index=False)
        return df.assign(__part=(h % n_part).astype("int64"))

    def pairs(g: pd.DataFrame) -> pa.Table:
        out_a, out_b = [], []
        for _, grp in g.groupby(["band", "key"], sort=False):
            if len(grp) < 2:
                continue
            mem = np.sort(grp["doc_id"].to_numpy(np.int64))
            ia, ib = np.triu_indices(len(mem), k=1)
            out_a.append(mem[ia])
            out_b.append(mem[ib])
        if not out_a:
            return pa.table({"doc_a": pa.array([], pa.int64()),
                             "doc_b": pa.array([], pa.int64())})
        df = pd.DataFrame({
            "doc_a": np.concatenate(out_a),
            "doc_b": np.concatenate(out_b)}).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    def dedup_pairs(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(["doc_a", "doc_b"])

    from ..stages.hashagg import hash_aggregate
    cand = hash_aggregate(
        docs.map_batches(band_rows, batch_format="pyarrow")
            .map_batches(tag, batch_format="pandas")
            .groupby("__part").map_groups(
                lambda g: pairs(g.drop(columns="__part")),
                batch_format="pandas"),
        ["doc_a", "doc_b"], dedup_pairs)

    empty = pa.table({
        "doc_a": pa.array([], pa.int64()),
        "doc_b": pa.array([], pa.int64()),
        "n_match": pa.array([], pa.int64()),
        "est_ppm": pa.array([], pa.int64()),
        "jac_ppm": pa.array([], pa.int64()),
        "err_ppm": pa.array([], pa.int64())})
    cand = join_ready(cand, n_part)
    if cand.count() == 0:
        return rd.from_arrow(empty)

    da = docs.map_batches(
        lambda df: df.rename(columns={"doc_id": "ka", "sig": "sig_a",
                                      "sh": "sh_a"}),
        batch_format="pandas")
    db = docs.map_batches(
        lambda df: df.rename(columns={"doc_id": "kb", "sig": "sig_b",
                                      "sh": "sh_b"}),
        batch_format="pandas")
    j = cand.join(join_ready(da, n_part), join_type="inner",
                  num_partitions=n_part, on=("doc_a",),
                  right_on=("ka",))
    j = join_ready(j, n_part).join(
        join_ready(db, n_part), join_type="inner",
        num_partitions=n_part, on=("doc_b",), right_on=("kb",))

    def score(df: pd.DataFrame) -> pa.Table:
        n = len(df)
        nm = np.empty(n, dtype=np.int64)
        jp = np.empty(n, dtype=np.int64)
        for i, (sa, sb, ha, hb) in enumerate(zip(
                df["sig_a"], df["sig_b"], df["sh_a"], df["sh_b"])):
            va = np.frombuffer(sa, dtype="<i8")
            vb = np.frombuffer(sb, dtype="<i8")
            nm[i] = int((va == vb).sum())
            wa = np.frombuffer(ha, dtype="<i8")
            wb = np.frombuffer(hb, dtype="<i8")
            inter = len(np.intersect1d(wa, wb, assume_unique=True))
            union = len(wa) + len(wb) - inter
            jp[i] = (1_000_000 * inter) // max(union, 1)
        est = (1_000_000 * nm) // AUDIT_NUM_PERM
        return pa.table({
            "doc_a": pa.array(df["doc_a"].to_numpy(np.int64),
                              pa.int64()),
            "doc_b": pa.array(df["doc_b"].to_numpy(np.int64),
                              pa.int64()),
            "n_match": pa.array(nm, pa.int64()),
            "est_ppm": pa.array(est, pa.int64()),
            "jac_ppm": pa.array(jp, pa.int64()),
            "err_ppm": pa.array(np.abs(est - jp), pa.int64())})

    return j.map_batches(score, batch_format="pandas")


def minhash_audit_oracle_sql(docs_cte: str, *, k: int = 3,
                             text_col: str = "text",
                             id_col: str = "doc_id") -> str:
    """DuckDB twin replaying shingles, permutations, banding and both
    scores with the SAME seeded constants."""
    a_c, b_c = _perm_consts()
    perm_rows = ", ".join(f"({i}, {int(a_c[i])}, {int(b_c[i])})"
                          for i in range(AUDIT_NUM_PERM))
    gram = " || ' ' || ".join(f"ws[i + {j}]" for j in range(k))
    return f"""
        WITH t AS MATERIALIZED (
          SELECT CAST({id_col} AS BIGINT) AS doc_id, {text_col} AS txt,
                 list_filter(string_split({text_col}, ' '),
                             x -> x <> '') AS ws
          FROM ({docs_cte})),
        sh AS MATERIALIZED (
          SELECT DISTINCT doc_id, h FROM (
            SELECT doc_id, unnest(list_transform(
                     generate_series(1, len(ws) - {k} + 1),
                     i -> CAST(('0x' || substr(md5({gram}), 1, 8))
                               AS BIGINT))) AS h
            FROM t WHERE len(ws) >= {k}
            UNION ALL
            SELECT doc_id,
                   CAST(('0x' || substr(md5(txt), 1, 8)) AS BIGINT)
            FROM t WHERE len(ws) BETWEEN 1 AND {k - 1})),
        perms AS (SELECT * FROM (VALUES {perm_rows}) p(perm, a, b)),
        sig AS MATERIALIZED (
          SELECT doc_id, perm,
                 MIN((a * h + b) % {_P}) AS v
          FROM sh CROSS JOIN perms GROUP BY 1, 2),
        bk AS MATERIALIZED (
          SELECT doc_id, perm // {_R} AS band,
                 string_agg(CAST(v AS VARCHAR), ':'
                            ORDER BY perm) AS key
          FROM sig GROUP BY 1, 2),
        cand AS MATERIALIZED (
          SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
          FROM bk x JOIN bk y
            ON x.band = y.band AND x.key = y.key
               AND x.doc_id < y.doc_id),
        est AS MATERIALIZED (
          SELECT c.doc_a, c.doc_b,
                 CAST(COUNT(*) FILTER (sx.v = sy.v) AS BIGINT)
                     AS n_match
          FROM cand c
          JOIN sig sx ON sx.doc_id = c.doc_a
          JOIN sig sy ON sy.doc_id = c.doc_b AND sy.perm = sx.perm
          GROUP BY 1, 2),
        sets AS MATERIALIZED (
          SELECT doc_id, list(h) AS hs, COUNT(*) AS n
          FROM sh GROUP BY doc_id),
        jac AS MATERIALIZED (
          SELECT c.doc_a, c.doc_b,
                 CAST(len(list_intersect(sa.hs, sb.hs)) AS BIGINT)
                     AS i,
                 CAST(sa.n + sb.n
                      - len(list_intersect(sa.hs, sb.hs)) AS BIGINT)
                     AS u
          FROM cand c
          JOIN sets sa ON sa.doc_id = c.doc_a
          JOIN sets sb ON sb.doc_id = c.doc_b)
        SELECT e.doc_a, e.doc_b, e.n_match,
               CAST((1000000 * e.n_match) // {AUDIT_NUM_PERM}
                    AS BIGINT) AS est_ppm,
               CAST((1000000 * j.i) // GREATEST(j.u, 1) AS BIGINT)
                   AS jac_ppm,
               CAST(abs((1000000 * e.n_match) // {AUDIT_NUM_PERM}
                        - (1000000 * j.i) // GREATEST(j.u, 1))
                    AS BIGINT) AS err_ppm
        FROM est e JOIN jac j
          ON e.doc_a = j.doc_a AND e.doc_b = j.doc_b"""
