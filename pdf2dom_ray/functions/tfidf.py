"""TF-IDF term scoring: per-document top-k salient terms.

The relevance-scoring pass of a corpus pipeline (keyword extraction,
topic labelling, search-index weighting): every document's tokens
scored by term frequency × inverse document frequency, keeping the
top-k terms per document.

Two execution strategies, identical output:

* ``broadcast`` — the (token → df) vocabulary table is aggregated
  with a narrow combiner shuffle, then ``ray.put`` once and fetched
  per actor in ``__init__``; documents are scored entirely inside
  ``map_batches`` (tf, score, local per-doc top-k), so the wide
  payload never shuffles.  Right whenever the vocabulary fits in a
  worker's heap (a deduplicated token→int64 map — tens of millions of
  tokens is fine).
* ``join`` — (doc_id, token, tf) rows shuffle-join the df table on
  token, then a per-doc group sort takes the top-k.  Two narrow
  shuffles, nothing driver-side, no broadcast: the path for a
  vocabulary that outgrows a single heap (web-scale corpora where
  URLs/typos blow the token space into the billions).

``auto`` picks broadcast when the vocabulary row count is under
``broadcast_limit``, else join.

The score is **integer** fixed-point — ``score_ppm = tf *
((1_000_000 * N) // df)`` — a linear inverse-document-frequency
weight, monotone per token in the classic log-idf at fixed corpus
size and exactly reproducible in SQL (a float ``log`` would differ in
last-ulp libm flavor between engines; see CLAUDE.md integer-aggregate
rule).  Ties rank by token ascending, so ranks are deterministic.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd
from ray.data.aggregate import Sum

__all__ = ["tfidf_topk", "bm25_topk"]


def _n_partitions() -> int:
    from ..scale import scale_partitions
    return scale_partitions()


def _tf_rows(t: pa.Table, text_col: str, id_col: str) -> pa.Table:
    """(doc_id, token, tf, dl) — globally unique (doc, token) pairs
    (each doc lives in exactly one input batch); dl = doc token count,
    computed row-locally so the join path never needs a dl shuffle."""
    from collections import Counter
    ids, toks, tfs, dls = [], [], [], []
    for d, text in zip(t.column(id_col).to_pylist(),
                       t.column(text_col).to_pylist()):
        c = Counter(w for w in (text or "").split(" ") if w)
        dl = sum(c.values())
        ids.extend([d] * len(c))
        toks.extend(c.keys())
        tfs.extend(c.values())
        dls.extend([dl] * len(c))
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "token": pa.array(toks, pa.string()),
                     "tf": pa.array(tfs, pa.int64()),
                     "dl": pa.array(dls, pa.int64())})


def _df_table(ds: rd.Dataset, text_col: str, id_col: str) -> rd.Dataset:
    """(token, df) — per-batch distinct-doc partials, combiner groupby."""

    def partial(t: pa.Table) -> pa.Table:
        from collections import Counter
        c: Counter = Counter()
        for text in t.column(text_col).to_pylist():
            c.update(set(w for w in (text or "").split(" ") if w))
        return pa.table({"token": pa.array(list(c.keys()), pa.string()),
                         "df": pa.array(list(c.values()), pa.int64())})

    df = ds.select_columns([text_col]).map_batches(
        partial, batch_format="pyarrow") \
        .groupby("token").aggregate(Sum("df", alias_name="df"))
    # Ray's sort-aggregate emits pandas blocks; coerce back to Arrow
    # (uniform-block-type rule, see CLAUDE.md) and materialize the
    # narrow vocab so its lineage doesn't re-run per consumer.
    return df.map_batches(lambda t: t,
                          batch_format="pyarrow").materialize()


def _collect_vocab(df: rd.Dataset) -> pa.Table:
    """Driver-side gather of the narrow (token, df) table; drops the
    schema-less zero-column blocks Ray's sort-aggregate can emit for
    empty partitions (Arrow gap, see CLAUDE.md)."""
    blocks = [b for b in ray.get(df.to_arrow_refs()) if b.num_columns]
    if not blocks:
        return pa.table({"token": pa.array([], pa.string()),
                         "df": pa.array([], pa.int64())})
    return pa.concat_tables(blocks)


def _topk_frame(g: pd.DataFrame, k: int,
                extra: tuple = ()) -> pd.DataFrame:
    g = g.sort_values(["score_ppm", "token"],
                      ascending=[False, True]).head(k)
    g = g.reset_index(drop=True)
    g["rnk"] = g.index + 1
    return g[["doc_id", "token", "tf", "df", *extra,
              "score_ppm", "rnk"]]


class _BroadcastScorer:
    """Actor-pool stage: vocabulary dict fetched once per actor."""

    def __init__(self, df_ref, n_docs: int, text_col: str,
                 id_col: str, k: int):
        t = ray.get(df_ref)
        self.df = dict(zip(t.column("token").to_pylist(),
                           t.column("df").to_pylist()))
        self.n = int(n_docs)
        self.text_col, self.id_col, self.k = text_col, id_col, k

    def __call__(self, t: pa.Table) -> pa.Table:
        from collections import Counter
        ids, toks, tfs, dfs, scores, rnks = [], [], [], [], [], []
        for d, text in zip(t.column(self.id_col).to_pylist(),
                           t.column(self.text_col).to_pylist()):
            c = Counter(w for w in (text or "").split(" ") if w)
            scored = []
            for tok, tf in c.items():
                df = self.df[tok]
                scored.append((tf * ((1_000_000 * self.n) // df),
                               tok, tf, df))
            scored.sort(key=lambda s: (-s[0], s[1]))
            for r, (sc, tok, tf, df) in enumerate(scored[:self.k], 1):
                ids.append(d)
                toks.append(tok)
                tfs.append(tf)
                dfs.append(df)
                scores.append(sc)
                rnks.append(r)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "token": pa.array(toks, pa.string()),
                         "tf": pa.array(tfs, pa.int64()),
                         "df": pa.array(dfs, pa.int64()),
                         "score_ppm": pa.array(scores, pa.int64()),
                         "rnk": pa.array(rnks, pa.int64())})


def _bm25_ppm(tf: int, df: int, dl: int, n: int, l: int) -> int:
    """Exact-rational BM25 core at k1=1.2, b=0.75, integer fixed-point.

    idf uses the rational argument of the classic log —
    (N−df+0.5)/(df+0.5) = (2N−2df+1)/(2df+1) — scaled to ppm
    (monotone in log-idf at fixed N).  The tf normalization is exact:
    tf·(k1+1)/(tf + k1·(1−b+b·dl·N/L)) with k1=6/5, b=3/4 multiplies
    through by 10L to 22·tf·L / (10·L·tf + 3·L + 9·dl·N).  Python
    bigints (and HUGEINT in the SQL twin) keep the intermediates
    exact at any corpus size — int64 would overflow at 100 TB L.
    """
    idf_ppm = (1_000_000 * (2 * n - 2 * df + 1)) // (2 * df + 1)
    tfn_ppm = (22 * tf * l * 1_000_000) // \
        (10 * l * tf + 3 * l + 9 * dl * n)
    return (idf_ppm * tfn_ppm) // 1_000_000


class _BM25Scorer:
    """Actor-pool stage: vocabulary + corpus totals fetched once."""

    def __init__(self, df_ref, n_docs: int, total_len: int,
                 text_col: str, id_col: str, k: int):
        t = ray.get(df_ref)
        self.df = dict(zip(t.column("token").to_pylist(),
                           t.column("df").to_pylist()))
        self.n, self.l = int(n_docs), int(total_len)
        self.text_col, self.id_col, self.k = text_col, id_col, k

    def __call__(self, t: pa.Table) -> pa.Table:
        from collections import Counter
        cols: dict[str, list] = {c: [] for c in (
            "doc_id", "token", "tf", "df", "dl", "score_ppm", "rnk")}
        for d, text in zip(t.column(self.id_col).to_pylist(),
                           t.column(self.text_col).to_pylist()):
            c = Counter(w for w in (text or "").split(" ") if w)
            dl = sum(c.values())
            scored = sorted(
                ((_bm25_ppm(tf, self.df[tok], dl, self.n, self.l),
                  tok, tf) for tok, tf in c.items()),
                key=lambda s: (-s[0], s[1]))
            for r, (sc, tok, tf) in enumerate(scored[:self.k], 1):
                cols["doc_id"].append(d)
                cols["token"].append(tok)
                cols["tf"].append(tf)
                cols["df"].append(self.df[tok])
                cols["dl"].append(dl)
                cols["score_ppm"].append(sc)
                cols["rnk"].append(r)
        return pa.table({
            "doc_id": pa.array(cols["doc_id"], pa.int64()),
            "token": pa.array(cols["token"], pa.string()),
            "tf": pa.array(cols["tf"], pa.int64()),
            "df": pa.array(cols["df"], pa.int64()),
            "dl": pa.array(cols["dl"], pa.int64()),
            "score_ppm": pa.array(cols["score_ppm"], pa.int64()),
            "rnk": pa.array(cols["rnk"], pa.int64())})


def bm25_topk(ds: rd.Dataset, *, text_col: str = "text",
              id_col: str = "doc_id", k: int = 5,
              strategy: str = "auto",
              broadcast_limit: int = 2_000_000) -> rd.Dataset:
    """(doc_id, token, tf, df, dl, score_ppm, rnk) — top-k BM25 terms
    per document at k1=1.2, b=0.75 (exact rational fixed-point; see
    ``_bm25_ppm``).  Same broadcast/join strategy split as
    :func:`tfidf_topk`; corpus totals N (all rows) and L (total token
    count) come from one narrow pre-pass."""
    from pdf2dom_ray.stages.pool import default_pool

    n_docs = ds.count()

    def len_partial(t: pa.Table) -> pa.Table:
        tot = sum(len([w for w in (x or "").split(" ") if w])
                  for x in t.column(text_col).to_pylist())
        return pa.table({"l": pa.array([tot], pa.int64())})

    total_len = int(ds.select_columns([text_col]).map_batches(
        len_partial, batch_format="pyarrow").sum("l") or 0)
    df = _df_table(ds, text_col, id_col)

    if strategy == "auto":
        strategy = "broadcast" if df.count() <= broadcast_limit \
            else "join"

    if strategy == "broadcast":
        df_ref = ray.put(_collect_vocab(df))
        return ds.select_columns([id_col, text_col]).map_batches(
            _BM25Scorer(df_ref, n_docs, total_len, text_col,
                        id_col, k),
            batch_format="pyarrow")

    if strategy != "join":
        raise ValueError(f"unknown strategy {strategy!r}")

    tf = ds.select_columns([id_col, text_col]).map_batches(
        lambda t: _tf_rows(t, text_col, id_col),
        batch_format="pyarrow")
    from .dedup import join_ready
    j = tf.join(join_ready(df, _n_partitions()), join_type="inner",
                num_partitions=_n_partitions(), on=("token",))

    def score(t: pa.Table) -> pa.Table:
        # Python bigints: exact at any L (int64 overflows at 100 TB)
        sc = [_bm25_ppm(tf_, df_, dl_, n_docs, total_len)
              for tf_, df_, dl_ in zip(t.column("tf").to_pylist(),
                                       t.column("df").to_pylist(),
                                       t.column("dl").to_pylist())]
        return t.append_column("score_ppm", pa.array(sc, pa.int64()))

    scored = j.map_batches(score, batch_format="pyarrow")
    out = scored.groupby("doc_id").map_groups(
        lambda g: _topk_frame(g, k, extra=("dl",)),
        batch_format="pandas")
    return out.map_batches(
        lambda t: pa.table({
            "doc_id": t.column("doc_id").cast(pa.int64()),
            "token": t.column("token").cast(pa.string()),
            "tf": t.column("tf").cast(pa.int64()),
            "df": t.column("df").cast(pa.int64()),
            "dl": t.column("dl").cast(pa.int64()),
            "score_ppm": t.column("score_ppm").cast(pa.int64()),
            "rnk": t.column("rnk").cast(pa.int64()),
        }), batch_format="pyarrow")


def tfidf_topk(ds: rd.Dataset, *, text_col: str = "text",
               id_col: str = "doc_id", k: int = 5,
               strategy: str = "auto",
               broadcast_limit: int = 2_000_000) -> rd.Dataset:
    """(doc_id, token, tf, df, score_ppm, rnk) — top-k terms per doc.

    score_ppm = tf * ((1_000_000 * N) // df); rank ties break on
    token ascending.  N is the full input row count (documents with
    empty/whitespace-only text still count, matching ``count(*)``).
    """
    from pdf2dom_ray.stages.pool import default_pool

    n_docs = ds.count()
    df = _df_table(ds, text_col, id_col)

    if strategy == "auto":
        strategy = "broadcast" if df.count() <= broadcast_limit \
            else "join"

    if strategy == "broadcast":
        df_ref = ray.put(_collect_vocab(df))
        return ds.select_columns([id_col, text_col]).map_batches(
            _BroadcastScorer(df_ref, n_docs, text_col, id_col, k),
            batch_format="pyarrow")

    if strategy != "join":
        raise ValueError(f"unknown strategy {strategy!r}")

    tf = ds.select_columns([id_col, text_col]).map_batches(
        lambda t: _tf_rows(t, text_col, id_col),
        batch_format="pyarrow")
    from .dedup import join_ready
    j = tf.join(join_ready(df, _n_partitions()), join_type="inner",
                num_partitions=_n_partitions(), on=("token",))

    def score(t: pa.Table) -> pa.Table:
        import numpy as np
        tfv = t.column("tf").to_numpy().astype(np.int64)
        dfv = t.column("df").to_numpy().astype(np.int64)
        sc = tfv * ((1_000_000 * np.int64(n_docs)) // dfv)
        return t.append_column("score_ppm", pa.array(sc, pa.int64()))

    scored = j.map_batches(score, batch_format="pyarrow")
    out = scored.groupby("doc_id").map_groups(
        lambda g: _topk_frame(g, k), batch_format="pandas")
    return out.map_batches(
        lambda t: pa.table({
            "doc_id": t.column("doc_id").cast(pa.int64()),
            "token": t.column("token").cast(pa.string()),
            "tf": t.column("tf").cast(pa.int64()),
            "df": t.column("df").cast(pa.int64()),
            "score_ppm": t.column("score_ppm").cast(pa.int64()),
            "rnk": t.column("rnk").cast(pa.int64()),
        }), batch_format="pyarrow")
