"""Conversion delay histogram (functions/conversion.py)."""
import duckdb
import pandas as pd
import ray.data as rd

from pdf2dom_ray.functions.conversion import (
    conversion_delay_histogram, conversion_delay_sql)


def test_conversion_matches_duckdb(ray_session, sf_dir):
    got = conversion_delay_histogram(sf_dir).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf_dir}/events.parquet')")
    want = con.execute(conversion_delay_sql()).fetchdf()
    assert got.reset_index(drop=True).equals(
        want.reset_index(drop=True))
    assert len(got) > 0


def test_conversion_partitions_signup_cohort(ray_session, sf_dir):
    got = conversion_delay_histogram(sf_dir).to_pandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type"])
    n_signup_users = ev.loc[ev.event_type == "signup",
                            "user_id"].nunique()
    assert got.n_users.sum() == n_signup_users


def test_conversion_partition_invariance(ray_session, sf_dir):
    a = conversion_delay_histogram(sf_dir,
                                   num_partitions=2).to_pandas()
    b = conversion_delay_histogram(sf_dir,
                                   num_partitions=7).to_pandas()
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))


def test_conversion_absent_to_type(ray_session, sf_dir):
    got = conversion_delay_histogram(
        sf_dir, to_type="no_such").to_pandas()
    assert got.delay_days.tolist() == [-1]


def test_user_accumulation_curve(ray_session, sf_dir):
    import sys
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as E
    got = E.queries()["user_accumulation"](sf_dir).to_pandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id"])
    assert got.cum_users.iloc[-1] == ev.user_id.nunique()
    assert got.cum_users.is_monotonic_increasing
    assert (got.n_new_users.cumsum() == got.cum_users).all()


def test_pareto_share_properties(ray_session, sf_dir):
    import sys
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as E
    got = E.queries()["pareto_share"](sf_dir).to_pandas()
    n, k = int(got.n_users[0]), int(got.k_top[0])
    assert k == -(-n // 5)
    # top-20% share is at least proportional and at most everything
    assert 200_000 <= int(got.share_ppm[0]) <= 1_000_000
    assert int(got.top_cents[0]) <= int(got.total_cents[0])


def test_dup_rate_by_source(ray_session, sf_dir):
    import hashlib
    import sys
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as E
    got = E.queries()["dup_rate_by_source"](sf_dir).to_pandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["source", "text"])
    h = docs["text"].map(
        lambda x: hashlib.md5(x.encode()).hexdigest())
    tot = h.map(h.value_counts())
    ref = pd.DataFrame({"source": docs["source"],
                        "dup": (tot > 1).astype("int64")}) \
        .groupby("source").agg(n_docs=("dup", "size"),
                               n_dup_docs=("dup", "sum"))
    m = got.set_index("source")
    assert m["n_docs"].equals(ref["n_docs"])
    assert m["n_dup_docs"].equals(ref["n_dup_docs"])


def test_revenue_lorenz_curve(ray_session, sf_dir):
    import sys
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as E
    got = E.queries()["revenue_lorenz"](sf_dir).to_pandas()
    assert got.decile.tolist() == list(range(1, 11))
    # Lorenz curve is convex-increasing to 1, below the diagonal
    assert got.cum_share_ppm.is_monotonic_increasing
    assert int(got.cum_share_ppm.iloc[-1]) == 1_000_000
    # direct pandas reference of the decile sums
    import hashlib

    import numpy as np
    ev = pd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type",
                                  "value"])
    p = ev[ev.event_type == "purchase"]
    u = pd.DataFrame({
        "user_id": p.user_id,
        "cents": np.floor(p.value.to_numpy() * 100).astype(
            "int64")}).groupby("user_id", as_index=False).sum() \
        .sort_values(["cents", "user_id"])
    n = len(u)
    q, r = divmod(n, 10)
    sizes = np.full(10, q)
    sizes[:r] += 1
    dec = np.repeat(np.arange(1, 11), sizes)
    ref = pd.DataFrame({"decile": dec,
                        "cents": u.cents.to_numpy()}) \
        .groupby("decile")["cents"].sum()
    assert got.set_index("decile")["decile_cents"].equals(ref)


def test_trimmed_mean_brute(ray_session, sf_dir):
    import numpy as np
    import sys
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as E
    got = E.queries()["trimmed_mean_revenue"](sf_dir).to_pandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])
    cents = np.sort(np.floor(
        ev.loc[ev.event_type == "purchase", "value"].to_numpy()
        * 100).astype("int64"))
    n = len(cents)
    k = n // 10
    mid = cents[k:n - k]
    assert int(got.trimmed_sum_cents[0]) == int(mid.sum())
    assert int(got.trimmed_mean_ppm[0]) == \
        (1_000_000 * int(mid.sum())) // len(mid)


def test_dn_retention_brute(ray_session, sf_dir):
    import numpy as np
    import sys
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as E
    got = E.queries()["dn_retention"](sf_dir).to_pandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])
    day = (ev.ts.astype("datetime64[us]").astype("int64")
           // 86_400_000_000)
    d = pd.DataFrame({"u": ev.user_id, "d": day}).drop_duplicates()
    first = d.groupby("u")["d"].min()
    have = set(zip(d.u, d.d))
    for n in (1, 7, 30):
        ret = sum((u, fd + n) in have for u, fd in first.items())
        row = got[got.n_day == n].iloc[0]
        assert int(row.n_cohort) == len(first)
        assert int(row.n_retained) == ret


def test_daily_lag_xcorr_brute(ray_session, sf_dir):
    import numpy as np
    import sys
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as E
    got = E.queries()["daily_lag_xcorr"](sf_dir).to_pandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "event_type"])
    day = (ev.ts.astype("datetime64[us]").astype("int64")
           // 86_400_000_000)
    lo, hi = int(day.min()), int(day.max())
    # series restricted to signup/purchase days only for bounds
    sel = ev.event_type.isin(["signup", "purchase"])
    dlo = int(day[sel].min())
    dhi = int(day[sel].max())
    L = dhi - dlo + 1
    x = np.zeros(L, "int64")
    y = np.zeros(L, "int64")
    for d, t in zip(day[sel], ev.event_type[sel]):
        if t == "signup":
            x[d - dlo] += 1
        else:
            y[d - dlo] += 1
    for _, r in got.iterrows():
        k = int(r.lag)
        xa, yb = x[:L - k], y[k:]
        assert int(r.sum_xy) == int((xa * yb).sum())
        assert int(r.cov_num) == len(xa) * int((xa * yb).sum()) \
            - int(xa.sum()) * int(yb.sum())


def test_url_range_splits_balanced(ray_session, sf_dir):
    import sys
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as E
    got = E.queries()["url_range_splits"](sf_dir).to_pandas()
    assert len(got) == 7
    assert got.split_url.is_monotonic_increasing
    # the split points partition the distinct url universe into 8
    # ranges whose sizes differ by at most 1
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id"])
    urls = sorted({f"https://docs.synth.test/{d}"
                   for d in docs.doc_id})
    import numpy as np
    edges = np.searchsorted(urls, got.split_url.tolist(),
                            side="right")
    sizes = np.diff(np.concatenate([[0], edges, [len(urls)]]))
    assert sizes.max() - sizes.min() <= 1


def test_acctbal_quartile_revenue(ray_session, sf_dir):
    import numpy as np
    import sys
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as E
    got = E.queries()["acctbal_quartile_revenue"](sf_dir) \
        .to_pandas()
    assert got.quartile.tolist() == [1, 2, 3, 4]
    ords = pd.read_parquet(f"{sf_dir}/orders.parquet",
                           columns=["o_totalprice"])
    total = int(np.floor(ords.o_totalprice.to_numpy() * 100).sum())
    assert got.revenue_cents.sum() == total      # partition of all
    assert got.n_orders.sum() == len(ords)
