"""Cohort / funnel analytics over event streams — the two classic
product-analytics aggregations, built on the engine's one wide
primitive (user-keyed ``group_apply`` exchange) with exact int64-µs
arithmetic so the SQL twins are bit-identical.

Scale shape:
- cohort_retention: one user-keyed exchange; each partition reduces
  its users to distinct (cohort_day, age_days) cells WITH partial
  counts, so the second exchange (cohort-keyed) carries cells —
  bounded by days², not by users or rows.
- funnel_steps: one user-keyed exchange; per partition a constant
  number (len(steps)) of masked min-reduce passes — no per-user loop;
  output is len(steps) rows per partition, summed driver-side.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from .partition import group_apply

_DAY_US = np.int64(86_400_000_000)


def cohort_retention(
    ds: ray.data.Dataset,
    key: str = "user_id",
    ts_col: str = "ts",
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Per (cohort day = a user's first-seen day, age in days): the
    number of distinct users active — the retention triangle.
    Returns (cohort_day, age_days, n_users) with cohort_day in epoch
    days."""

    def per_user_cells(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, ts_col], kind="mergesort")
        g = df[key].to_numpy()
        day = df[ts_col].to_numpy("datetime64[us]").view(np.int64) // _DAY_US
        new = np.r_[True, g[1:] != g[:-1]]
        gid = np.cumsum(new) - 1
        cohort = day[new][gid]  # first row per user is its min day (sorted)
        age = day - cohort
        # distinct (user, age) cells, then partial-count per (cohort, age)
        cell = np.stack([gid, age])
        uniq = np.unique(cell, axis=1)
        out = (pd.DataFrame({
            "cohort_day": cohort[new][uniq[0]],
            "age_days": uniq[1],
        }).groupby(["cohort_day", "age_days"], as_index=False)
            .size().rename(columns={"size": "_n"}))
        return out

    cells = group_apply(ds, per_user_cells, num_partitions=num_partitions,
                        key=key)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["cohort_day", "age_days"], as_index=False)["_n"].sum()
        return out.rename(columns={"_n": "n_users"})

    # users are whole within a partition, so partial counts are already
    # distinct-user counts; the cohort-keyed exchange just sums them
    return group_apply(cells, merge, num_partitions=num_partitions,
                       key="cohort_day")


def funnel_steps(
    ds: ray.data.Dataset,
    steps: tuple = ("signup", "click", "purchase"),
    key: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    num_partitions: int = 16,
) -> pd.DataFrame:
    """Strict-order funnel: a user reaches step i+1 only via an event
    of that type STRICTLY after their step-i time (earliest-completion
    semantics: each step's time is the min qualifying ts).  Returns
    one row per step: (step_idx, step, n_users)."""
    steps = tuple(steps)

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key], kind="mergesort")
        g = df[key].to_numpy()
        tus = df[ts_col].to_numpy("datetime64[us]").view(np.int64)
        et = df[type_col].to_numpy()
        new = np.r_[True, g[1:] != g[:-1]]
        gid = np.cumsum(new) - 1
        n_users = int(gid[-1]) + 1 if len(gid) else 0
        prev = np.full(n_users, -(2**62), np.int64)  # step-0 gate: -inf
        alive = np.ones(n_users, bool)
        counts = []
        for s in steps:
            t = np.full(n_users, 2**62, np.int64)
            m = (et == s) & alive[gid] & (tus > prev[gid])
            np.minimum.at(t, gid[m], tus[m])
            alive = alive & (t < 2**62)
            counts.append(int(alive.sum()))
            prev = t
        return pd.DataFrame({
            "step_idx": np.arange(1, len(steps) + 1, dtype=np.int64),
            "step": list(steps),
            "_n": np.array(counts, np.int64),
        })

    parts = group_apply(ds, per_part, num_partitions=num_partitions,
                        key=key).to_pandas()
    out = (parts.groupby(["step_idx", "step"], as_index=False)["_n"].sum()
           .rename(columns={"_n": "n_users"}))
    return out.sort_values("step_idx").reset_index(drop=True)


def distinct_per_window(
    ds: ray.data.Dataset,
    bucket_s: int = 86400,
    key: str = "user_id",
    ts_col: str = "ts",
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Exact distinct-key count per time bucket (the daily-active-users
    aggregate).  Each block first reduces to its distinct
    (bucket, key) cells — bounded by buckets × keys, not rows — then
    one bucket-keyed exchange dedups across blocks and counts."""
    step = np.int64(bucket_s) * 1_000_000

    def cells(df: pd.DataFrame) -> pd.DataFrame:
        tus = df[ts_col].to_numpy("datetime64[us]").view(np.int64)
        out = pd.DataFrame({"bucket_us": (tus // step) * step,
                            key: df[key].to_numpy()})
        return out.drop_duplicates(["bucket_us", key])

    def count(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates(["bucket_us", key])
        out = d.groupby("bucket_us", as_index=False).size()
        return out.rename(columns={"size": "n_users"})

    c = ds.map_batches(cells, batch_format="pandas")
    return group_apply(c, count, num_partitions=num_partitions,
                       key="bucket_us")


def percent_rank_in_group(
    ds: ray.data.Dataset,
    key: str = "user_id",
    val_col: str = "value",
    id_col: str = "event_id",
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Tie-aware percent rank of each row's value within its group —
    SQL ``percent_rank()`` semantics: (min-rank − 1)/(n − 1), 0 for
    single-row groups.  One sort + run-boundary scan per partition."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, val_col, id_col], kind="mergesort")
        if not len(df):
            return df[[key, id_col, val_col]].assign(pr=np.zeros(0))
        g = df[key].to_numpy()
        v = df[val_col].to_numpy()
        new_k = np.r_[True, g[1:] != g[:-1]]
        new_v = np.r_[True, new_k[1:] | (v[1:] != v[:-1])]
        idx = np.arange(len(g))
        kstart = idx[new_k][np.cumsum(new_k) - 1]       # group start idx
        vstart = idx[new_v][np.cumsum(new_v) - 1]       # value-run start
        starts = np.flatnonzero(new_k)
        n = (np.r_[starts[1:], len(g)] - starts)[np.cumsum(new_k) - 1]
        r = (vstart - kstart).astype(np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            pr = np.where(n > 1, r / (n - 1).astype(np.float64), 0.0)
        out = df[[key, id_col, val_col]].copy()
        out["pr"] = pr
        return out.reset_index(drop=True)

    return group_apply(ds, fn, num_partitions=num_partitions, key=key)


def group_profile(
    ds: ray.data.Dataset,
    key: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    attr_col: str = "event_type",
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Per-key lifecycle profile: row count, first/last timestamp,
    first/last attribute value (by (ts, order)), and active span in
    whole seconds — the summary row a user-facing dashboard keys on.
    Pure selection + int64 µs arithmetic (bit-exact vs ordered
    first/last SQL aggregates)."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, ts_col, order_col], kind="mergesort")
        g = df[key].to_numpy()
        tus = df[ts_col].to_numpy("datetime64[us]").view(np.int64)
        a = df[attr_col].to_numpy()
        new = np.r_[True, g[1:] != g[:-1]]
        starts = np.flatnonzero(new)
        ends = np.r_[starts[1:], len(g)] - 1
        return pd.DataFrame({
            key: g[starts],
            "n": (np.r_[starts[1:], len(g)] - starts).astype(np.int64),
            "first_ts": df[ts_col].to_numpy()[starts],
            "last_ts": df[ts_col].to_numpy()[ends],
            "first_" + attr_col: a[starts],
            "last_" + attr_col: a[ends],
            "span_s": ((tus[ends] - tus[starts]) // 1_000_000).astype(np.int64),
        })

    return group_apply(ds, fn, num_partitions=num_partitions, key=key)


def group_mode(
    ds: ray.data.Dataset,
    key: str = "user_id",
    attr: str = "event_type",
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Exact per-key mode of a categorical column (ties broken by the
    lexicographically smallest value — SQL row_number over
    (count DESC, value ASC)).  Map-side (key, value) cell counts shrink
    every block to its distinct cells before the one hash exchange, so
    the shuffle carries ≤ keys × |attr alphabet| cells, not rows."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby([key, attr], as_index=False).size()
                .rename(columns={"size": "_n"}))

    cells = ds.map_batches(partial, batch_format="pandas")

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        agg = df.groupby([key, attr], as_index=False)["_n"].sum()
        agg = agg.sort_values([key, "_n", attr],
                              ascending=[True, False, True],
                              kind="mergesort")
        top = agg.groupby(key, as_index=False).head(1)
        return (top.rename(columns={attr: "mode_" + attr, "_n": "n"})
                .reset_index(drop=True))

    return group_apply(cells, pick, num_partitions=num_partitions, key=key)


def cooccurrence_pairs(
    ds: ray.data.Dataset,
    key: str = "user_id",
    attr: str = "event_type",
    num_partitions: int = 16,
) -> pd.DataFrame:
    """Global co-occurrence counts: for every unordered pair of
    distinct ``attr`` values seen under the same key, the number of
    keys exhibiting both.  Map-side distinct (key, attr) cells → one
    hash exchange on key → per-partition vectorized self-merge
    (bounded by |alphabet|² per key) → tiny pair-count combine on the
    driver (≤ |alphabet|² rows total).  Assumes a broadcast-small
    attr alphabet (event types, languages, labels), NOT high-cardinality
    attrs — documented partitioning assumption."""

    def distinct_cells(df: pd.DataFrame) -> pd.DataFrame:
        return df[[key, attr]].drop_duplicates()

    cells = ds.map_batches(distinct_cells, batch_format="pandas")

    def pair_counts(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates([key, attr])
        m = d.merge(d, on=key, suffixes=("_a", "_b"))
        m = m[m[attr + "_a"] < m[attr + "_b"]]
        out = (m.groupby([attr + "_a", attr + "_b"], as_index=False)
               .size().rename(columns={"size": "_n",
                                       attr + "_a": "type_a",
                                       attr + "_b": "type_b"}))
        return out

    parts = group_apply(cells, pair_counts,
                        num_partitions=num_partitions, key=key).to_pandas()
    if parts.empty:
        return pd.DataFrame({"type_a": pd.Series(dtype=object),
                             "type_b": pd.Series(dtype=object),
                             "n_keys": pd.Series(dtype="int64")})
    out = (parts.groupby(["type_a", "type_b"], as_index=False)["_n"].sum()
           .rename(columns={"_n": "n_keys"}))
    out["n_keys"] = out["n_keys"].astype(np.int64)
    return (out.sort_values(["type_a", "type_b"])
            .reset_index(drop=True))


def grouping_sets_rollup(
    ds: ray.data.Dataset,
    dim: str = "event_type",
    ts_col: str = "ts",
    value: str = "value",
    value_scale: int = 100,
) -> pd.DataFrame:
    """GROUPING SETS ((dim, day), (dim), (day), ()) in ONE input pass:
    map-side combine to finest-grain (dim, day-bucket) cells; all four
    aggregation levels derive from the cell table by re-summing exact
    int64 partials (order-independent, so every level is bit-exact).
    Rolled-up dimensions emit NULL, SQL-style.  The exchange carries
    cells (dims × days), never rows."""
    day_us = 86_400_000_000

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        tus = df[ts_col].to_numpy("datetime64[us]").view(np.int64)
        v = df[value].to_numpy(np.float64)
        ok = ~np.isnan(v)
        cents = np.where(ok, np.round(v * value_scale), 0.0).astype(np.int64)
        g = pd.DataFrame({
            dim: df[dim].to_numpy(),
            "bucket_us": (tus // day_us) * day_us,
            "_c": np.ones(len(df), np.int64),
            "_vc": ok.astype(np.int64),
            "_s": cents,
        })
        return g.groupby([dim, "bucket_us"], as_index=False).sum()

    # keyed pre-combine: the driver receives ≤ dims × days final
    # cells, never blocks × cells (int partials are order-free)
    cells = (group_apply(
        ds.map_batches(partial, batch_format="pandas"),
        lambda df: df.groupby([dim, "bucket_us"], as_index=False).sum(),
        num_partitions=4, key=dim).to_pandas()
        .groupby([dim, "bucket_us"], as_index=False).sum())

    def level(keep: list) -> pd.DataFrame:
        if keep:
            agg = cells.groupby(keep, as_index=False)[["_c", "_vc", "_s"]].sum()
        else:
            agg = cells[["_c", "_vc", "_s"]].sum().to_frame().T
        if dim not in keep:
            agg[dim] = None
        if "bucket_us" not in keep:
            agg["bucket_us"] = np.nan
        return agg

    out = pd.concat(
        [level([dim, "bucket_us"]), level([dim]), level(["bucket_us"]),
         level([])], ignore_index=True)
    out["n"] = out["_c"].to_numpy(np.int64)
    s = out["_s"].to_numpy(np.float64)
    vc = out["_vc"].to_numpy(np.int64)
    out["sum_value"] = np.where(vc > 0, s / value_scale, np.nan)
    # float64 (NaN for rolled-up rows), matching DuckDB's pandas
    # conversion of nullable BIGINT; day-epoch µs < 2^53 stays exact
    out["bucket_us"] = out["bucket_us"].to_numpy(np.float64)
    return (out[[dim, "bucket_us", "n", "sum_value"]]
            .sort_values([dim, "bucket_us"], na_position="first")
            .reset_index(drop=True))


def transition_matrix(
    ds: ray.data.Dataset,
    key: str = "user_id",
    attr: str = "event_type",
    ts_col: str = "ts",
    order: str = "event_id",
    num_partitions: int = 16,
) -> pd.DataFrame:
    """Markov transition counts: for every ordered pair of consecutive
    events in a key's (ts, order)-sorted stream, how many transitions
    type_from → type_to occur (SQL lead() semantics; a key's last
    event has no successor).  One key-hash exchange; per partition a
    single lexsort + shifted-array adjacency mask + pair groupby, so
    each partition reduces to ≤ |alphabet|² cells before the tiny
    driver-side combine.  Assumes a broadcast-small attr alphabet."""

    def cells(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"type_from": pd.Series(dtype=object),
                                 "type_to": pd.Series(dtype=object),
                                 "_n": pd.Series(dtype="int64")})
        codes, _ = pd.factorize(df[key])
        tus = df[ts_col].to_numpy("datetime64[us]").view(np.int64)
        oid = df[order].to_numpy(np.int64)
        perm = np.lexsort((oid, tus, codes))
        c = codes[perm]
        # integer-code the alphabet once; pair cells via bincount on
        # from*|A|+to (the object-dtype pair groupby was the hot spot:
        # 3x the whole-kernel cost at 2M rows)
        acode, alphabet = pd.factorize(df[attr])
        a = acode[perm]
        same = c[1:] == c[:-1]  # consecutive rows of the same key
        na = len(alphabet)
        pair = a[:-1][same].astype(np.int64) * na + a[1:][same]
        cnt = np.bincount(pair, minlength=na * na)
        nz = np.flatnonzero(cnt)
        alpha = np.asarray(alphabet, dtype=object)
        return pd.DataFrame({"type_from": alpha[nz // na],
                             "type_to": alpha[nz % na],
                             "_n": cnt[nz].astype(np.int64)})

    parts = group_apply(ds, cells, num_partitions=num_partitions,
                        key=key).to_pandas()
    if parts.empty:
        return pd.DataFrame({"type_from": pd.Series(dtype=object),
                             "type_to": pd.Series(dtype=object),
                             "n": pd.Series(dtype="int64")})
    out = (parts.groupby(["type_from", "type_to"], as_index=False)["_n"]
           .sum().rename(columns={"_n": "n"}))
    out["n"] = out["n"].astype(np.int64)
    return (out.sort_values(["type_from", "type_to"])
            .reset_index(drop=True))


def user_growth(
    ds: ray.data.Dataset,
    key: str = "user_id",
    ts_col: str = "ts",
    num_partitions: int = 16,
) -> pd.DataFrame:
    """Growth accounting: per day, the number of first-seen keys and
    the running cumulative total, ordered by day.  Map-side per-block
    (key → min day) partials shrink every block to its distinct keys;
    the one key-hash exchange carries those cells; per partition the
    true min per key reduces to ≤ days cells; the driver combines
    day-count cells (bounded by the calendar) and prefix-sums."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        tus = df[ts_col].to_numpy("datetime64[us]").view(np.int64)
        day = (tus // _DAY_US) * _DAY_US
        g = pd.DataFrame({key: df[key].to_numpy(), "_d": day})
        return g.groupby(key, as_index=False)["_d"].min()

    cells = ds.map_batches(partial, batch_format="pandas")

    def day_counts(df: pd.DataFrame) -> pd.DataFrame:
        first = df.groupby(key, as_index=False)["_d"].min()
        out = (first.groupby("_d", as_index=False).size()
               .rename(columns={"_d": "bucket_us", "size": "_n"}))
        return out

    parts = group_apply(cells, day_counts,
                        num_partitions=num_partitions, key=key).to_pandas()
    if parts.empty:
        return pd.DataFrame({"bucket_us": pd.Series(dtype="int64"),
                             "new_users": pd.Series(dtype="int64"),
                             "cum_users": pd.Series(dtype="int64")})
    out = (parts.groupby("bucket_us", as_index=False)["_n"].sum()
           .rename(columns={"_n": "new_users"})
           .sort_values("bucket_us").reset_index(drop=True))
    out["new_users"] = out["new_users"].astype(np.int64)
    out["cum_users"] = out["new_users"].cumsum().astype(np.int64)
    return out


def type_variety(
    ds: ray.data.Dataset,
    key: str = "user_id",
    attr: str = "event_type",
    num_partitions: int = 16,
) -> pd.DataFrame:
    """Variety histogram: for each distinct-``attr`` count k, the
    number of keys exhibiting exactly k distinct values — the
    engagement-breadth distribution.  Map-side distinct (key, attr)
    cells → one key-hash exchange → per-partition nunique + histogram
    cells (≤ |alphabet| rows per partition) → driver combine."""

    def distinct_cells(df: pd.DataFrame) -> pd.DataFrame:
        return df[[key, attr]].drop_duplicates()

    cells = ds.map_batches(distinct_cells, batch_format="pandas")

    def hist(df: pd.DataFrame) -> pd.DataFrame:
        k = (df.drop_duplicates([key, attr]).groupby(key).size()
             .to_numpy(np.int64))
        if not len(k):
            return pd.DataFrame({"n_types": pd.Series(dtype="int64"),
                                 "_n": pd.Series(dtype="int64")})
        cnt = np.bincount(k)
        nz = np.flatnonzero(cnt)
        return pd.DataFrame({"n_types": nz.astype(np.int64),
                             "_n": cnt[nz].astype(np.int64)})

    parts = group_apply(cells, hist, num_partitions=num_partitions,
                        key=key).to_pandas()
    if parts.empty:
        return pd.DataFrame({"n_types": pd.Series(dtype="int64"),
                             "n_users": pd.Series(dtype="int64")})
    out = (parts.groupby("n_types", as_index=False)["_n"].sum()
           .rename(columns={"_n": "n_users"})
           .sort_values("n_types").reset_index(drop=True))
    out["n_users"] = out["n_users"].astype(np.int64)
    return out


def share_of_bucket(
    ds: ray.data.Dataset,
    attr: str = "event_type",
    ts_col: str = "ts",
    bucket_s: int = 86400,
) -> pd.DataFrame:
    """Percent-of-total enrichment: each (attr, time-bucket) cell's
    count plus its share of that bucket's total — the window-share
    class (SQL ``count / sum(count) OVER (PARTITION BY bucket)``).
    Map-side partial combine: every block reduces to ≤ attrs × buckets
    exact-int cells before the driver's tiny final groupby; the share
    division is the only float and mirrors the SQL expression."""
    span = np.int64(bucket_s) * 1_000_000

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        b = (df[ts_col].to_numpy("datetime64[us]").astype(np.int64)
             // span) * span
        g = (pd.DataFrame({attr: df[attr].to_numpy(), "bucket_us": b})
             .groupby([attr, "bucket_us"], as_index=False).size())
        return g.rename(columns={"size": "cnt"})

    # per-block partials reduce through a keyed exchange first: the
    # driver receives ≤ attrs × buckets final cells, never blocks × cells
    parts = group_apply(
        ds.map_batches(partial, batch_format="pandas"),
        lambda df: df.groupby([attr, "bucket_us"],
                              as_index=False)["cnt"].sum(),
        num_partitions=4, key=attr,
    ).to_pandas()
    if parts.empty:
        return pd.DataFrame({attr: pd.Series(dtype=object),
                             "bucket_us": pd.Series(dtype="int64"),
                             "cnt": pd.Series(dtype="int64"),
                             "share": pd.Series(dtype="float64")})
    cells = parts
    tot = cells.groupby("bucket_us")["cnt"].transform("sum")
    cells["cnt"] = cells["cnt"].astype(np.int64)
    cells["share"] = cells["cnt"].to_numpy(np.float64) \
        / tot.to_numpy(np.float64)
    return (cells.sort_values([attr, "bucket_us"])
            .reset_index(drop=True))


def sequence_pattern_count(
    ds: ray.data.Dataset,
    pattern: str,
    key: str = "user_id",
    attr: str = "event_type",
    ts_col: str = "ts",
    order_col: str = "event_id",
    num_partitions: int = 16,
) -> pd.DataFrame:
    """Sequence-pattern mining: encode each key's (ts, order)-ordered
    ``attr`` stream as a string (first character of each value) and
    count non-overlapping regex matches — "error recovered into
    purchase"-style behavioral motifs that funnels (subsequence) and
    transitions (bigrams) cannot express.

    Use backtrack-free patterns (character classes + */+, no
    alternation) so Python-re and RE2/DuckDB agree on match spans.
    Attr first characters must be ASCII (same documented precondition
    as canonicalize_text; a non-ASCII value raises rather than
    corrupting); EMPTY attr values contribute nothing to the sequence
    — exactly SQL's ``string_agg('' …)``.  One key-hash exchange;
    char encoding and sorting are vectorized, the per-KEY loop
    (bytes slice + compiled findall) is bounded by keys, never
    events."""
    import re

    rx = re.compile(pattern)

    def per_key(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({key: pd.Series(dtype="int64"),
                                 "seq_len": pd.Series(dtype="int64"),
                                 "n_matches": pd.Series(dtype="int64")})
        nonempty = df[attr].astype(str).str.len() > 0
        df = df[nonempty] if not nonempty.all() else df
        if not len(df):
            return pd.DataFrame({key: pd.Series(dtype="int64"),
                                 "seq_len": pd.Series(dtype="int64"),
                                 "n_matches": pd.Series(dtype="int64")})
        kc, kuniq = pd.factorize(df[key])
        ac, auniq = pd.factorize(df[attr])
        heads = "".join(str(v)[0] for v in auniq)
        try:
            encoded = heads.encode("ascii")
        except UnicodeEncodeError as e:
            raise ValueError(
                "sequence_pattern_count needs ASCII attr first "
                f"characters (got {heads!r})") from e
        first_char = np.frombuffer(encoded, dtype=np.uint8)
        tus = df[ts_col].to_numpy("datetime64[us]").view(np.int64)
        oid = df[order_col].to_numpy(np.int64)
        perm = np.lexsort((oid, tus, kc))
        k = kc[perm]
        chars = first_char[ac[perm]]
        starts = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
        ends = np.r_[starts[1:], len(k)]
        buf = chars.tobytes()
        keys, lens, hits = [], [], []
        for s, e in zip(starts, ends):
            seq = buf[s:e].decode("ascii")
            keys.append(kuniq[k[s]])
            lens.append(e - s)
            hits.append(len(rx.findall(seq)))
        return pd.DataFrame({key: np.asarray(keys),
                             "seq_len": np.asarray(lens, dtype=np.int64),
                             "n_matches": np.asarray(hits, dtype=np.int64)})

    out = group_apply(ds, per_key, num_partitions=num_partitions,
                      key=key).to_pandas()
    if out.empty:
        return per_key(pd.DataFrame())
    return out.sort_values(key).reset_index(drop=True)


def lateness_report(
    ds: ray.data.Dataset,
    key: str = "user_id",
    ts_col: str = "ts",
    arrival_col: str = "event_id",
    num_partitions: int = 16,
) -> pd.DataFrame:
    """Out-of-order arrival diagnostics (the watermark-sizing input
    for any event-time streaming consumer): replay each key's events
    in ARRIVAL order (``arrival_col``) and flag rows whose event time
    is strictly below the running event-time maximum; report per key
    the late count, worst lateness (µs), and late fraction.

    One key-hash exchange; the per-key running max is one global
    ``maximum.accumulate`` over key-offset time values (each key's
    values live in a disjoint band, so the cummax resets at key
    boundaries without a loop)."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        cols = {key: pd.Series(dtype="int64"),
                "n": pd.Series(dtype="int64"),
                "n_late": pd.Series(dtype="int64"),
                "max_late_us": pd.Series(dtype="int64"),
                "frac_late": pd.Series(dtype="float64")}
        if not len(df):
            return pd.DataFrame(cols)
        kc, _ = pd.factorize(df[key])
        tus = df[ts_col].to_numpy("datetime64[us]").view(np.int64)
        arr = df[arrival_col].to_numpy(np.int64)
        perm = np.lexsort((arr, kc))
        k, t = kc[perm], tus[perm]
        tn = t - t.min()
        band = np.int64(tn.max()) + 1 if len(tn) else np.int64(1)
        # guard in PYTHON ints — an int64 product here would itself
        # wrap and wave the oversized input through
        if (int(k.max()) + 1) * int(band) >= 2**62:
            raise OverflowError("lateness band overflow — shrink "
                                "partition key-count or time span")
        shifted = tn + k.astype(np.int64) * band
        run = np.maximum.accumulate(shifted)
        prev = np.r_[np.int64(-1), run[:-1]]
        new_key = np.r_[True, k[1:] != k[:-1]]
        late = (~new_key) & (shifted < prev)
        lateness = np.where(late, prev - shifted, 0)
        gid = np.cumsum(new_key) - 1
        ng = int(gid[-1]) + 1
        key_start = np.flatnonzero(new_key)
        n = np.bincount(gid, minlength=ng).astype(np.int64)
        nl = np.bincount(gid, weights=late, minlength=ng).astype(np.int64)
        # rows are key-sorted: reduceat beats the slow ufunc.at scatter
        ml = np.maximum.reduceat(lateness, key_start).astype(np.int64)
        return pd.DataFrame({
            key: df[key].to_numpy()[perm][new_key],
            "n": n, "n_late": nl, "max_late_us": ml,
            "frac_late": nl.astype(np.float64) / n.astype(np.float64),
        })

    out = group_apply(ds, fn, num_partitions=num_partitions,
                      key=key).to_pandas()
    if out.empty:
        return fn(pd.DataFrame())
    return out.sort_values(key).reset_index(drop=True)


def profile_columns(
    ds: ray.data.Dataset,
    columns: dict,
    num_partitions: int = 8,
) -> pd.DataFrame:
    """ANALYZE-style table profile: one output row per column with
    row count, null count, EXACT distinct count, and numeric min/max
    (NaN for non-numeric columns) — the data-quality / planner-stats
    pass a 100-TB ingest runs before anything else.

    ``columns`` maps column name → kind (``"num"`` | ``"time"`` |
    ``"str"``); time columns report min/max as epoch-µs doubles.

    Scale shape: counts and min/max come from map-side per-block
    cells (no shuffle); the exact distinct count runs one
    distinct-cell exchange PER COLUMN carrying already-deduplicated
    block-level values — traffic bounded by block-distinct values of
    that single column, the daily_active pattern applied per
    column."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for c, kind in columns.items():
            v = df[c]
            nn = int(v.isna().sum())
            if kind == "time":
                x = v.dropna().to_numpy("datetime64[us]").astype(np.int64)
            elif kind == "num":
                x = v.dropna().to_numpy(np.float64)
            else:
                x = None
            rows.append((c, len(v), nn,
                         float(x.min()) if x is not None and len(x)
                         else np.nan,
                         float(x.max()) if x is not None and len(x)
                         else np.nan))
        return pd.DataFrame(rows, columns=["col_name", "_n", "_nn",
                                           "_mn", "_mx"])

    # per-block cells reduce through a col_name-keyed exchange: the
    # driver receives one row per column, never blocks × columns
    cells = group_apply(
        ds.map_batches(partial, batch_format="pandas"),
        lambda df: df.groupby("col_name", as_index=False).agg(
            _n=("_n", "sum"), _nn=("_nn", "sum"),
            _mn=("_mn", "min"), _mx=("_mx", "max")),
        num_partitions=2, key="col_name",
    ).to_pandas()
    agg = cells.groupby("col_name", as_index=False).agg(
        n=("_n", "sum"), n_null=("_nn", "sum"),
        min_v=("_mn", "min"), max_v=("_mx", "max"))

    distinct = {}
    for c, kind in columns.items():
        col = ds.select_columns([c])

        def uniq(df: pd.DataFrame, c=c) -> pd.DataFrame:
            u = df[c].dropna().unique()
            return pd.DataFrame({c: u})

        dcells = col.map_batches(uniq, batch_format="pandas")
        n_dist = group_apply(
            dcells,
            lambda df, c=c: pd.DataFrame(
                {"d": [df[c].nunique()]}).astype(np.int64),
            num_partitions=num_partitions, key=c,
        ).to_pandas()["d"].sum()
        distinct[c] = int(n_dist)
    agg["n_distinct"] = agg["col_name"].map(distinct).astype(np.int64)
    agg["n"] = agg["n"].astype(np.int64)
    agg["n_null"] = agg["n_null"].astype(np.int64)
    return (agg[["col_name", "n", "n_null", "n_distinct", "min_v", "max_v"]]
            .sort_values("col_name").reset_index(drop=True))


def type_entropy(
    ds: ray.data.Dataset,
    key: str = "user_id",
    attr: str = "event_type",
    num_partitions: int = 16,
) -> pd.DataFrame:
    """Per-key Shannon entropy of the ``attr`` distribution (nats),
    via H = ln(n) − (Σ c·ln c)/n over exact int64 per-type counts —
    the behavioral-diversity feature.  The float combination mirrors
    the SQL expression op-for-op; the Σ over a key's handful of type
    terms is the only order-sensitive reduction (≤ types summands,
    round-6-stable in practice — the EWMA argument).

    One key-hash exchange; per partition: one lexsort to (key, type)
    cells, then per-key ``add.reduceat`` over c·ln(c) terms."""

    def per_key(df: pd.DataFrame) -> pd.DataFrame:
        cols = {key: pd.Series(dtype="int64"),
                "n": pd.Series(dtype="int64"),
                "n_types": pd.Series(dtype="int64"),
                "entropy": pd.Series(dtype="float64")}
        if not len(df):
            return pd.DataFrame(cols)
        kc, kuniq = pd.factorize(df[key])
        ac, _ = pd.factorize(df[attr])
        perm = np.lexsort((ac, kc))
        k, a = kc[perm], ac[perm]
        cell = np.flatnonzero(np.r_[True, (k[1:] != k[:-1])
                                    | (a[1:] != a[:-1])])
        c = np.diff(np.r_[cell, len(k)]).astype(np.int64)
        ck = k[cell]
        kstart = np.flatnonzero(np.r_[True, ck[1:] != ck[:-1]])
        n = np.add.reduceat(c, kstart)
        cf = c.astype(np.float64)
        s = np.add.reduceat(cf * np.log(cf), kstart)
        nf = n.astype(np.float64)
        return pd.DataFrame({
            key: np.asarray(kuniq)[ck[kstart]],
            "n": n.astype(np.int64),
            "n_types": np.diff(np.r_[kstart, len(c)]).astype(np.int64),
            "entropy": np.log(nf) - s / nf,
        })

    out = group_apply(ds, per_key, num_partitions=num_partitions,
                      key=key).to_pandas()
    if out.empty:
        return per_key(pd.DataFrame())
    return out.sort_values(key).reset_index(drop=True)


def pagerank_types(
    ds: ray.data.Dataset,
    damping: float = 0.85,
    iters: int = 10,
    key: str = "user_id",
    attr: str = "event_type",
    num_partitions: int = 16,
) -> pd.DataFrame:
    """PageRank over the event-type transition graph: nodes are the
    distinct ``attr`` values, edge weights are the Markov transition
    counts (``transition_matrix``), damping 0.85, uniform init,
    dangling mass redistributed uniformly, a FIXED ``iters`` rounds —
    deterministic, so the SQL twin (the same update unrolled as
    ``iters`` chained CTEs) reproduces it to round-6.

    Scale shape: the expensive part — reducing the raw event stream
    to the |alphabet|² edge-count table — is the distributed
    transition exchange; the rank iteration then runs driver-side
    over the broadcast-small node set (same small-side rule as
    components.py's driver CC).  Per-round update, mirrored
    op-for-op by the SQL:

        r' = 0.15/N + 0.85·(Σ_in (r_src·n)/w_src + dang/N)
    """
    edges = transition_matrix(ds, key=key, attr=attr,
                              num_partitions=num_partitions)

    def distinct_partial(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({attr: df[attr].unique()})

    nodes = np.sort(
        ds.select_columns([attr])
        .map_batches(distinct_partial, batch_format="pandas")
        .to_pandas()[attr].unique())
    n_nodes = len(nodes)
    if n_nodes == 0:
        return pd.DataFrame({attr: pd.Series(dtype=object),
                             "out_n": pd.Series(dtype="int64"),
                             "pagerank": pd.Series(dtype="float64")})
    idx = pd.Series(np.arange(n_nodes), index=nodes)
    src = idx[edges["type_from"].to_numpy()].to_numpy()
    dst = idx[edges["type_to"].to_numpy()].to_numpy()
    en = edges["n"].to_numpy(np.float64)
    w = np.zeros(n_nodes, np.int64)
    np.add.at(w, src, edges["n"].to_numpy(np.int64))
    wf = w.astype(np.float64)
    nd = float(n_nodes)
    r = np.full(n_nodes, 1.0 / nd)
    for _ in range(iters):
        contrib = (r[src] * en) / wf[src]
        inflow = np.zeros(n_nodes)
        np.add.at(inflow, dst, contrib)
        dang = r[w == 0].sum()
        r = (1.0 - damping) / nd + damping * (inflow + dang / nd)
    return pd.DataFrame({attr: nodes, "out_n": w, "pagerank": r})


def decayed_topk(
    ds: ray.data.Dataset,
    half_life_days: float = 1.0,
    top: int = 20,
    key: str = "user_id",
    ts_col: str = "ts",
    num_partitions: int = 16,
) -> pd.DataFrame:
    """Recency-weighted activity ranking: each event contributes
    ``0.5^(age_days / half_life)`` relative to the stream's max event
    time, summed per key — the time-decayed heavy-hitters view (a
    plain count ranks a dead-but-formerly-hot key first; this ranks
    by current heat).

    Anchor = global max ts (one metadata-cheap pass).  The per-key
    sum of same-sign power() terms mirrors the SQL expression; the
    ~1e-13 summation-order residual is far below round-6 (the EWMA
    argument).  One key exchange of (key, decayed-partial) cells —
    each block pre-sums its keys, so the exchange carries cells, not
    rows."""
    tmax = int(pd.Timestamp(ds.max(ts_col)).value) // 1000

    def cells(df: pd.DataFrame) -> pd.DataFrame:
        tus = df[ts_col].to_numpy("datetime64[us]").view(np.int64)
        age = (np.float64(tmax) - tus.astype(np.float64)) \
            / 86_400_000_000.0 / half_life_days
        w = np.power(0.5, age)
        g = (pd.DataFrame({key: df[key], "w": w, "one": np.int64(1)})
             .groupby(key, as_index=False)
             .agg(w=("w", "sum"), n=("one", "sum")))
        g["n"] = g["n"].astype(np.int64)
        return g

    from .partition import group_apply
    merged = group_apply(
        ds.select_columns([key, ts_col]).map_batches(
            cells, batch_format="pandas"),
        lambda df: df.groupby(key, as_index=False).agg(
            w=("w", "sum"), n=("n", "sum")),
        num_partitions=num_partitions, key=key).to_pandas()
    merged["n"] = merged["n"].astype(np.int64)
    out = merged.rename(columns={"w": "decayed"})
    return (out.sort_values(["decayed", key],
                            ascending=[False, True])
            .head(top).reset_index(drop=True)[[key, "n", "decayed"]])


def transition_pmi(
    ds: ray.data.Dataset,
    key: str = "user_id",
    attr: str = "event_type",
    num_partitions: int = 16,
) -> pd.DataFrame:
    """Pointwise mutual information over consecutive event-type pairs
    — collocation scoring for event streams:
    pmi(a→b) = ln(n_ab·N / (n_a·· · n_··b)) from the exact int64
    transition counts (positive ⇒ the pair co-occurs more than the
    marginals predict).  All products stay < 2⁵³, so the single ln
    argument is bit-identical in the SQL twin.

    Distributed cost = the transition exchange; the |alphabet|²
    marginal algebra is driver-side broadcast-small."""
    e = transition_matrix(ds, key=key, attr=attr,
                          num_partitions=num_partitions)
    if e.empty:
        return pd.DataFrame({"type_from": pd.Series(dtype=object),
                             "type_to": pd.Series(dtype=object),
                             "n": pd.Series(dtype="int64"),
                             "pmi": pd.Series(dtype="float64")})
    N = np.int64(e["n"].sum())
    row = e.groupby("type_from")["n"].sum()
    col = e.groupby("type_to")["n"].sum()
    ra = row.loc[e["type_from"]].to_numpy(np.int64)
    cb = col.loc[e["type_to"]].to_numpy(np.int64)
    n = e["n"].to_numpy(np.int64)
    pmi = np.log((n * N).astype(np.float64)
                 / (ra * cb).astype(np.float64))
    out = e.copy()
    out["pmi"] = pmi
    return (out.sort_values(["type_from", "type_to"])
            .reset_index(drop=True))


def corr_matrix(
    ds: ray.data.Dataset,
    cols: tuple = ("l_quantity", "l_extendedprice", "l_discount",
                   "l_tax"),
    scales: tuple = (100, 1, 10000, 10000),
) -> pd.DataFrame:
    """Column-pairwise Pearson correlation in ONE streaming pass:
    each block emits int64 sufficient statistics (n, Σxᵢ, Σxᵢxⱼ for
    i ≤ j — a (k²+3k)/2-cell partial), the driver sums, and each r is
    one mirrored float expression
      r = (n·Sxy − Sx·Sy) / (sqrt(n·Sxx − Sx·Sx) · sqrt(n·Syy − Sy·Sy)).
    Pearson r is invariant to linear scaling, so each column carries
    its OWN quantization scale (``scales``) — chosen so
    n·(scale·max|v|)² stays < 2⁶³ (the big-money column quantizes at
    ×1, the small-ratio columns at ×10⁴); the SQL twin mirrors each
    scale literally."""
    cols = list(cols)
    k = len(cols)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        X = np.stack([np.rint(df[c].to_numpy(np.float64) * float(s))
                      .astype(np.int64)
                      for c, s in zip(cols, scales)], axis=1)
        out = {"n": [np.int64(len(X))]}
        for i in range(k):
            out[f"s{i}"] = [X[:, i].sum()]
            for j in range(i, k):
                out[f"p{i}_{j}"] = [(X[:, i] * X[:, j]).sum()]
        return pd.DataFrame(out)

    st = ds.select_columns(cols).map_batches(
        partial, batch_format="pandas").to_pandas().sum()
    n = float(int(st["n"]))
    rows = []
    for i in range(k):
        for j in range(i + 1, k):
            sx, sy = float(int(st[f"s{i}"])), float(int(st[f"s{j}"]))
            sxy = float(int(st[f"p{i}_{j}"]))
            sxx = float(int(st[f"p{i}_{i}"]))
            syy = float(int(st[f"p{j}_{j}"]))
            r = ((n * sxy - sx * sy)
                 / (np.sqrt(n * sxx - sx * sx)
                    * np.sqrt(n * syy - sy * sy)))
            rows.append((cols[i], cols[j], r))
    return pd.DataFrame(rows, columns=["col_a", "col_b", "r"])


def touch_attribution(
    ds: ray.data.Dataset,
    conversion: str = "purchase",
    key: str = "user_id",
    attr: str = "event_type",
    ts_col: str = "ts",
    order_col: str = "event_id",
    lookback_s: int = 7 * 86400,
    num_partitions: int = 16,
) -> pd.DataFrame:
    """Marketing-style conversion attribution: for every
    ``conversion`` event, credit the FIRST and LAST non-conversion
    touch inside the lookback window, then aggregate credited
    conversions per channel (= ``attr`` value) for both models.

    One key-hash exchange (a user's events stay whole), one lexsort
    per partition, searchsorted window bounds — no per-row Python.
    Emits one row per channel: first_touch / last_touch credit counts
    and n_conversions (conversions with ≥1 eligible touch, identical
    for both models by construction)."""
    from .partition import group_apply

    def per_key(df: pd.DataFrame) -> pd.DataFrame:
        cols = {attr: pd.Series(dtype=object),
                "first_touch": pd.Series(dtype="int64"),
                "last_touch": pd.Series(dtype="int64")}
        if not len(df):
            return pd.DataFrame(cols)
        kc, _ = pd.factorize(df[key])
        tus = df[ts_col].to_numpy("datetime64[us]").view(np.int64)
        oid = df[order_col].to_numpy(np.int64)
        av = df[attr].to_numpy()
        perm = np.lexsort((oid, tus, kc))
        k, t, a = kc[perm], tus[perm], av[perm]
        is_conv = a == conversion
        look = np.int64(lookback_s) * 1_000_000
        ac, auniq = pd.factorize(a)
        fcnt = np.zeros(len(auniq), np.int64)
        lcnt = np.zeros(len(auniq), np.int64)
        # per key: touches = non-conversion rows; window bounds for
        # ALL of the key's conversions in two vectorized searchsorteds
        key_start = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
        key_end = np.r_[key_start[1:], len(k)]
        for s, e in zip(key_start, key_end):
            c_k = is_conv[s:e]
            touch_ts = t[s:e][~c_k]
            if not len(touch_ts):
                continue
            touch_c = ac[s:e][~c_k]
            ct = t[s:e][c_k]
            lo = np.searchsorted(touch_ts, ct - look, side="left")
            hi = np.searchsorted(touch_ts, ct, side="left")
            ok = hi > lo
            np.add.at(fcnt, touch_c[lo[ok]], 1)
            np.add.at(lcnt, touch_c[hi[ok] - 1], 1)
        used = np.flatnonzero(fcnt | lcnt)
        return pd.DataFrame({
            attr: np.asarray(auniq)[used],
            "first_touch": fcnt[used],
            "last_touch": lcnt[used],
        })

    cells = group_apply(ds, per_key, num_partitions=num_partitions,
                        key=key).to_pandas()
    if not len(cells):
        return pd.DataFrame({attr: [], "first_touch": [],
                             "last_touch": [], "n_conversions": []})
    out = (cells.groupby(attr, as_index=False)[["first_touch",
                                                "last_touch"]].sum())
    out["first_touch"] = out["first_touch"].astype(np.int64)
    out["last_touch"] = out["last_touch"].astype(np.int64)
    n_conv = np.int64(out["first_touch"].sum())
    out["n_conversions"] = n_conv
    return out.sort_values(attr, kind="mergesort").reset_index(drop=True)


def gini_coefficient(
    ds: ray.data.Dataset,
    key: str = "user_id",
    num_partitions: int = 16,
) -> pd.DataFrame:
    """Gini inequality coefficient of per-key activity: over the
    sorted per-key event counts x_1 ≤ … ≤ x_n,
    G = Σ (2i − n − 1)·x_i / (n · Σ x_i) — 0 when activity is uniform,
    → 1 under extreme concentration (the skew health-check for
    hot-key planning).  Map-side per-block counts reduce through one
    keyed exchange to n final cells; the numerator is an EXACT int64
    (ranks × counts), so engine and SQL agree bit-for-bit before the
    single final division."""
    from .partition import group_apply

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(key, as_index=False, observed=True).size()
        return g.rename(columns={"size": "cnt"})

    counts = group_apply(
        ds.select_columns([key]).map_batches(partial,
                                             batch_format="pandas"),
        lambda df: df.groupby(key, as_index=False,
                              observed=True)["cnt"].sum(),
        num_partitions=num_partitions, key=key,
    ).to_pandas()
    x = np.sort(counts["cnt"].to_numpy(np.int64), kind="mergesort")
    n = len(x)
    total = int(x.sum())
    if n == 0 or total == 0:
        gini = 0.0
        num = 0
    else:
        i = np.arange(1, n + 1, dtype=np.int64)
        num = int(((2 * i - n - 1) * x).sum())
        gini = float(num) / (n * total)
    return pd.DataFrame({
        "n_keys": [np.int64(n)],
        "total_events": [np.int64(total)],
        "gini_num": [np.int64(num)],
        "gini": [gini],
    })


def psi_drift(
    ds: ray.data.Dataset,
    val_col: str = "value",
    ts_col: str = "ts",
    n_bins: int = 10,
    num_partitions: int = 8,
) -> pd.DataFrame:
    """Population Stability Index — the ML data-drift health check:
    split the stream at the EXACT global median timestamp, bin both
    halves by the reference half's value deciles, and report
    PSI = Σ (p_i − q_i)·ln(p_i / q_i) with Laplace-smoothed shares
    p = (c + 0.5) / (n + bins/2).  Everything up to the one mirrored
    float expression is exact: the median and decile bounds come from
    the distributed rank-selection kernel (≡ quantile_cont bit-for-
    bit), counts are int64 cells through one tiny keyed exchange.
    Emits one row per bin (exact counts + round-able contribution) —
    a 10-row verification surface rather than a single scalar."""
    from .partition import group_apply
    from ..stages.selection import grouped_rank_quantiles

    def kspace(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "g": np.zeros(len(df), np.int8),
            "v": np.rint(df[val_col].to_numpy(np.float64)
                         * 100.0).astype(np.int64),
            "t": df[ts_col].to_numpy("datetime64[us]").view(np.int64),
        })

    mat = ds.select_columns([val_col, ts_col]).map_batches(
        kspace, batch_format="pandas").materialize()
    med = float(grouped_rank_quantiles(
        mat, "g", "t", ps=(0.5,))["q_0"].iloc[0])
    med_ref = ray.put(med)

    def ref_only(df: pd.DataFrame) -> pd.DataFrame:
        return df[df["t"].to_numpy(np.int64) <= ray.get(med_ref)]

    qs = tuple((i + 1) / n_bins for i in range(n_bins - 1))
    bounds = grouped_rank_quantiles(
        mat.map_batches(ref_only, batch_format="pandas").materialize(),
        "g", "v", ps=qs)
    bvals = np.array([float(bounds[f"q_{i}"].iloc[0])
                      for i in range(n_bins - 1)])
    b_ref = ray.put((med, bvals))

    def bin_counts(df: pd.DataFrame) -> pd.DataFrame:
        m, bv = ray.get(b_ref)
        v = df["v"].to_numpy(np.int64)
        t = df["t"].to_numpy(np.int64)
        b = np.searchsorted(bv, v, side="left")  # = Σ_j [v > b_j]
        rows = []
        for is_ref in (True, False):
            sel = b[t <= m] if is_ref else b[t > m]
            c = np.bincount(sel, minlength=len(bv) + 1)
            rows.append(pd.DataFrame({
                "bin": np.arange(len(c), dtype=np.int64),
                "side": np.int64(0 if is_ref else 1),
                "c": c.astype(np.int64)}))
        return pd.concat(rows, ignore_index=True)

    cells = group_apply(
        mat.map_batches(bin_counts, batch_format="pandas"),
        lambda df: df.groupby(["bin", "side"], as_index=False)["c"].sum(),
        num_partitions=num_partitions, key="bin",
    ).to_pandas()
    piv = (cells.pivot_table(index="bin", columns="side", values="c",
                             aggfunc="sum", fill_value=0)
           .reindex(range(n_bins), fill_value=0))
    c_ref = piv.get(0, pd.Series(0, index=piv.index)).to_numpy(np.int64)
    c_cur = piv.get(1, pd.Series(0, index=piv.index)).to_numpy(np.int64)
    n_ref, n_cur = int(c_ref.sum()), int(c_cur.sum())
    p = (c_ref + 0.5) / (n_ref + n_bins / 2.0)
    q = (c_cur + 0.5) / (n_cur + n_bins / 2.0)
    contrib = (p - q) * np.log(p / q)
    return pd.DataFrame({
        "bin": np.arange(n_bins, dtype=np.int64),
        "c_ref": c_ref, "c_cur": c_cur,
        "n_ref": np.int64(n_ref), "n_cur": np.int64(n_cur),
        "contrib": contrib, "psi": float(contrib.sum()),
    })


def record_highs(
    ds: ray.data.Dataset,
    key: str = "user_id",
    val_col: str = "value",
    ts_col: str = "ts",
    order_col: str = "event_id",
    num_partitions: int = 16,
) -> pd.DataFrame:
    """Per-key running-record analysis: how many events set a new
    all-time high (strictly above every earlier value; the first
    event is a record), plus the final maximum.  Exact int-quantized
    comparisons; one key-hash exchange + a prefix-max per key."""
    from .partition import group_apply

    def per_key(df: pd.DataFrame) -> pd.DataFrame:
        cols = {key: pd.Series(dtype="int64"),
                "n_events": pd.Series(dtype="int64"),
                "n_records": pd.Series(dtype="int64"),
                "final_max": pd.Series(dtype="float64")}
        if not len(df):
            return pd.DataFrame(cols)
        kc, kuniq = pd.factorize(df[key])
        tus = df[ts_col].to_numpy("datetime64[us]").view(np.int64)
        oid = df[order_col].to_numpy(np.int64)
        vq = np.rint(df[val_col].to_numpy(np.float64) * 100.0).astype(
            np.int64)
        perm = np.lexsort((oid, tus, kc))
        k, v = kc[perm], vq[perm]
        new_key = np.r_[True, k[1:] != k[:-1]]
        starts = np.flatnonzero(new_key)
        ends = np.r_[starts[1:], len(k)]
        out = []
        for s, e in zip(starts, ends):
            vk = v[s:e]
            pmax = np.maximum.accumulate(vk)
            rec = np.r_[True, vk[1:] > pmax[:-1]]
            out.append((int(np.asarray(kuniq)[k[s]]),
                        np.int64(e - s), np.int64(int(rec.sum())),
                        float(pmax[-1] / 100.0)))
        return pd.DataFrame(out, columns=list(cols))

    return (group_apply(ds, per_key, num_partitions=num_partitions,
                        key=key).to_pandas()
            .sort_values(key, kind="mergesort").reset_index(drop=True))


def k_anonymity(
    ds: ray.data.Dataset,
    quasi_cols: tuple = ("event_type",),
    k: int = 5,
    num_partitions: int = 16,
) -> pd.DataFrame:
    """Privacy-audit primitive for training-data curation: group rows
    by the quasi-identifier tuple and report how many equivalence
    classes (and rows) fall below anonymity threshold ``k`` —
    releasing those rows would make individuals re-identifiable.
    Map-side per-block class counts reduce through one keyed exchange
    to final class cells (bounded by the quasi-id alphabet, never
    corpus size); every output is an exact int64 except the one
    mirrored risk-share division."""
    from .partition import group_apply

    cols = list(quasi_cols)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(cols, as_index=False, observed=True).size()
        return g.rename(columns={"size": "cnt"})

    cells = group_apply(
        ds.select_columns(cols).map_batches(partial,
                                            batch_format="pandas"),
        lambda df: df.groupby(cols, as_index=False,
                              observed=True)["cnt"].sum(),
        num_partitions=num_partitions, key=cols[0],
    ).to_pandas()
    cnt = cells["cnt"].to_numpy(np.int64)
    total = int(cnt.sum())
    risky = cnt < k
    return pd.DataFrame({
        "n_classes": [np.int64(len(cnt))],
        "n_rows": [np.int64(total)],
        "min_class_size": [np.int64(cnt.min()) if len(cnt) else np.int64(0)],
        "n_risky_classes": [np.int64(int(risky.sum()))],
        "n_risky_rows": [np.int64(int(cnt[risky].sum()))],
        "risky_row_share": [float(int(cnt[risky].sum())) / total
                            if total else 0.0],
    })


def kaplan_meier(
    ds: ray.data.Dataset,
    key: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    start_type: str = "signup",
    event_type: str = "purchase",
    num_partitions: int = 16,
) -> pd.DataFrame:
    """Kaplan–Meier survival estimator for time-to-conversion: each
    key's duration runs from its first ``start_type`` event to its
    first LATER ``event_type`` event (right-censored at the global max
    timestamp when none).  One keyed exchange reduces to one
    (duration, observed) cell per key; the curve itself is over
    distinct observed-event times: n_at_risk (durations ≥ t), d
    deaths, and S(t) = exp(Σ ln(1 − d/n)) — computed as the identical
    log-sum-exp op sequence the SQL twin uses, so the floats agree.
    All counts exact int64."""
    from .partition import group_apply

    def per_key(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for uid, g in df.groupby(key, observed=True):
            tus = g[ts_col].to_numpy("datetime64[us]").view(np.int64)
            et = g[type_col].to_numpy()
            st = tus[et == start_type]
            if not len(st):
                # keys without a start event still contribute their
                # max ts to the global censor time (oracle's mx CTE
                # is max over ALL events) — emit a t0=-1 sentinel row
                out.append((int(uid), -1, -1, int(tus.max())))
                continue
            t0 = int(st.min())
            ev = tus[(et == event_type) & (tus > t0)]
            out.append((int(uid), t0,
                        int(ev.min()) if len(ev) else -1,
                        int(tus.max())))
        return pd.DataFrame(out, columns=[key, "t0", "tp", "tmax"])

    cells = group_apply(
        ds.select_columns([key, type_col, ts_col]),
        per_key, num_partitions=num_partitions, key=key,
    ).to_pandas()
    if not len(cells):
        return pd.DataFrame({"duration_us": pd.Series(dtype="int64"),
                             "n_risk": pd.Series(dtype="int64"),
                             "n_events": pd.Series(dtype="int64"),
                             "survival": pd.Series(dtype="float64")})
    tmax = int(cells["tmax"].max())
    # global censor time = max ts over ALL events (every event belongs
    # to some key and every key emits a tmax row, start event or not)
    cells = cells[cells["t0"] >= 0]
    if not len(cells):
        return pd.DataFrame({"duration_us": pd.Series(dtype="int64"),
                             "n_risk": pd.Series(dtype="int64"),
                             "n_events": pd.Series(dtype="int64"),
                             "survival": pd.Series(dtype="float64")})
    obs = cells["tp"].to_numpy(np.int64) >= 0
    dur = np.where(obs, cells["tp"].to_numpy(np.int64),
                   tmax) - cells["t0"].to_numpy(np.int64)
    evt_times = np.unique(dur[obs])
    rows = []
    logsum = 0.0
    for t in evt_times:
        n_risk = int((dur >= t).sum())
        d = int((dur[obs] == t).sum())
        logsum += float(np.log(1.0 - float(d) / n_risk)) \
            if d < n_risk else float("-inf")
        rows.append((int(t), np.int64(n_risk), np.int64(d),
                     float(np.exp(logsum))))
    return pd.DataFrame(rows, columns=["duration_us", "n_risk",
                                       "n_events", "survival"])


def zipf_exponent(
    ds: ray.data.Dataset,
    key: str = "user_id",
    num_partitions: int = 16,
) -> pd.DataFrame:
    """Discrete power-law (Zipf) exponent of per-key activity via the
    Clauset–Shalizi–Newman continuous-MLE approximation
    α ≈ 1 + n / Σ ln(x_i / (x_min − 1/2)) over per-key counts — the
    quantitative version of the skew check behind hot-key salting and
    LPT placement (this corpus's conv sizes are Zipf by
    construction).  Counts are exact int64 cells through one keyed
    exchange; the ln-sum and α are the mirrored float expressions."""
    from .partition import group_apply

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(key, as_index=False, observed=True).size()
        return g.rename(columns={"size": "cnt"})

    counts = group_apply(
        ds.select_columns([key]).map_batches(partial,
                                             batch_format="pandas"),
        lambda df: df.groupby(key, as_index=False,
                              observed=True)["cnt"].sum(),
        num_partitions=num_partitions, key=key,
    ).to_pandas()
    x = counts["cnt"].to_numpy(np.int64)
    n = len(x)
    if n == 0:
        return pd.DataFrame({"n_keys": [np.int64(0)],
                             "x_min": [np.int64(0)],
                             "ln_sum": [0.0], "alpha": [np.nan]})
    xmin = int(x.min())
    ln_sum = float(np.log(x.astype(np.float64)
                          / (xmin - 0.5)).sum())
    alpha = 1.0 + n / ln_sum if ln_sum > 0 else np.nan
    return pd.DataFrame({
        "n_keys": [np.int64(n)], "x_min": [np.int64(xmin)],
        "ln_sum": [ln_sum], "alpha": [alpha],
    })


def chi_square_independence(
    ds: ray.data.Dataset,
    col_a: str = "event_type",
    col_b: str = "hour",
    num_partitions: int = 8,
) -> pd.DataFrame:
    """Pearson chi-square test of independence over a contingency
    table of two bounded-alphabet columns: observed counts are exact
    int64 cells (one keyed exchange); expected counts and the χ²
    statistic are the mirrored float expressions
    e = row_total·col_total/N, χ² = Σ (o−e)²/e.  The categorical
    drift/association check that pairs with psi_drift's numeric
    one."""
    from .partition import group_apply

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby([col_a, col_b], as_index=False,
                       observed=True).size()
        return g.rename(columns={"size": "o"})

    cells = group_apply(
        ds.select_columns([col_a, col_b]).map_batches(
            partial, batch_format="pandas"),
        lambda df: df.groupby([col_a, col_b], as_index=False)["o"].sum(),
        num_partitions=num_partitions, key=col_a,
    ).to_pandas()
    piv = cells.pivot_table(index=col_a, columns=col_b, values="o",
                            aggfunc="sum", fill_value=0)
    O = piv.to_numpy(np.int64)
    N = int(O.sum())
    rt = O.sum(axis=1, keepdims=True).astype(np.float64)
    ct = O.sum(axis=0, keepdims=True).astype(np.float64)
    E = rt * ct / N
    chi2 = float(((O - E) ** 2 / E).sum())
    dof = (O.shape[0] - 1) * (O.shape[1] - 1)
    return pd.DataFrame({
        "n_rows": [np.int64(N)],
        "n_classes_a": [np.int64(O.shape[0])],
        "n_classes_b": [np.int64(O.shape[1])],
        "dof": [np.int64(dof)],
        "chi2": [chi2],
    })


def auc_mann_whitney(
    ds: ray.data.Dataset,
    label_col: str = "event_type",
    positive: str = "purchase",
    score_col: str = "value",
    num_partitions: int = 8,
) -> pd.DataFrame:
    """ROC-AUC of a score against a binary label via the
    Mann–Whitney identity AUC = (R⁺ − n⁺(n⁺+1)/2) / (n⁺·n⁻) with R⁺
    the rank-sum of positives under tie-averaged ranks — the
    model-eval primitive, computable exactly: ranks are carried as
    DOUBLED int64s (tie group on 1-based positions p..q has doubled
    rank p+q), so the U statistic is an exact integer and only the
    final ratio is float.  Distributed: scores reduce to exact
    per-(score, label) count cells through one keyed exchange
    (bounded by distinct quantized scores), and the rank-sum is
    computed from the cells — never from corpus-sized rows."""
    from .partition import group_apply

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        s = np.rint(df[score_col].to_numpy(np.float64) * 100.0).astype(
            np.int64)
        y = (df[label_col].to_numpy() == positive)
        g = (pd.DataFrame({"s": s, "y": y.astype(np.int64)})
             .groupby(["s", "y"], as_index=False).size())
        return g.rename(columns={"size": "c"})

    cells = group_apply(
        ds.select_columns([label_col, score_col]).map_batches(
            partial, batch_format="pandas"),
        lambda df: df.groupby(["s", "y"], as_index=False)["c"].sum(),
        num_partitions=num_partitions, key="s",
    ).to_pandas().sort_values(["s", "y"]).reset_index(drop=True)
    piv = cells.pivot_table(index="s", columns="y", values="c",
                            aggfunc="sum", fill_value=0).sort_index()
    cpos = piv.get(1, pd.Series(0, index=piv.index)).to_numpy(np.int64)
    cneg = piv.get(0, pd.Series(0, index=piv.index)).to_numpy(np.int64)
    tot = cpos + cneg
    # doubled tie-averaged rank of each distinct score group: the
    # group spans 1-based positions (below+1 .. below+tot)
    below = np.r_[np.int64(0), np.cumsum(tot)[:-1]]
    drank = (below + 1) + (below + tot)  # p + q, doubled-average rank
    n_pos, n_neg = int(cpos.sum()), int(cneg.sum())
    r_pos2 = int((drank * cpos).sum())  # doubled rank-sum of positives
    u2 = r_pos2 - n_pos * (n_pos + 1)  # doubled U
    auc = (float(u2) / (2.0 * n_pos * n_neg)
           if n_pos and n_neg else np.nan)
    return pd.DataFrame({
        "n_pos": [np.int64(n_pos)], "n_neg": [np.int64(n_neg)],
        "u2": [np.int64(u2)], "auc": [auc],
    })


_BENFORD_P = [0.0] + [float(np.log10(1.0 + 1.0 / d)) for d in range(1, 10)]


def benford_digits(
    ds: ray.data.Dataset,
    val_col: str = "value",
    num_partitions: int = 8,
) -> pd.DataFrame:
    """Benford's-law first-digit audit — the data-forensics classic
    for spotting fabricated or clipped numeric columns: distribution
    of the leading decimal digit of |round(value·100)| (zero values
    excluded) vs the expected log10(1 + 1/d), with the chi-square
    distance.  The leading digit is computed in INT space (repeated
    integer division — no float formatting), counts reduce to 9
    cells through one keyed exchange; expected shares and chi² are
    the mirrored float expressions."""
    from .partition import group_apply

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        v = np.abs(np.rint(df[val_col].to_numpy(np.float64)
                           * 100.0).astype(np.int64))
        v = v[v > 0]
        while_big = v.copy()
        # strip trailing digits until single digit (vectorized loop
        # over digit COUNT, ≤ 19 passes for int64)
        for _ in range(19):
            big = while_big >= 10
            if not big.any():
                break
            while_big[big] //= 10
        g = pd.DataFrame({"d": while_big}).groupby(
            "d", as_index=False).size()
        return g.rename(columns={"size": "c"})

    cells = group_apply(
        ds.select_columns([val_col]).map_batches(
            partial, batch_format="pandas"),
        lambda df: df.groupby("d", as_index=False)["c"].sum(),
        num_partitions=num_partitions, key="d",
    ).to_pandas()
    cnt = np.zeros(10, np.int64)
    cnt[cells["d"].to_numpy(np.int64)] = cells["c"].to_numpy(np.int64)
    n = int(cnt[1:].sum())
    digs = np.arange(1, 10)
    obs = cnt[1:]
    exp = np.array(_BENFORD_P[1:]) * n
    chi2 = float(((obs - exp) ** 2 / exp).sum()) if n else np.nan
    return pd.DataFrame({
        "digit": digs.astype(np.int64),
        "observed": obs,
        "share": obs / n if n else np.nan,
        "expected_share": np.array(_BENFORD_P[1:]),
        "n_values": np.int64(n),
        "chi2": chi2,
    })


def runs_test(
    ds: ray.data.Dataset,
    key: str = "user_id",
    val_col: str = "value",
    ts_col: str = "ts",
    order_col: str = "event_id",
    num_partitions: int = 16,
) -> pd.DataFrame:
    """Wald–Wolfowitz runs test per key: is the above/below-median
    sign sequence random in time?  Median from the shared
    duck_quantile kernel; values equal to the median are dropped
    (classic treatment); runs/n₊/n₋ exact int64; the normal
    approximation z = (R − μ)/σ with μ = 2n₊n₋/n + 1,
    σ² = 2n₊n₋(2n₊n₋ − n)/(n²(n−1)) is the mirrored float."""
    from ..oracle.rollup import duck_quantile
    from .partition import group_apply

    def per_key(df: pd.DataFrame) -> pd.DataFrame:
        cols = {key: pd.Series(dtype="int64"),
                "n_used": pd.Series(dtype="int64"),
                "n_runs": pd.Series(dtype="int64"),
                "z_runs": pd.Series(dtype="float64")}
        if not len(df):
            return pd.DataFrame(cols)
        out = []
        kc, kuniq = pd.factorize(df[key])
        tus = df[ts_col].to_numpy("datetime64[us]").view(np.int64)
        oid = df[order_col].to_numpy(np.int64)
        vq = np.rint(df[val_col].to_numpy(np.float64) * 100.0).astype(
            np.int64)
        perm = np.lexsort((oid, tus, kc))
        k, v = kc[perm], vq[perm]
        starts = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
        ends = np.r_[starts[1:], len(k)]
        for s, e in zip(starts, ends):
            vk = v[s:e].astype(np.float64)
            med = duck_quantile(np.sort(vk, kind="mergesort"), 0.5)
            sign = vk[vk != med] > med
            n = len(sign)
            np_, nn_ = int(sign.sum()), int((~sign).sum())
            if n < 2 or not np_ or not nn_:
                out.append((int(np.asarray(kuniq)[k[s]]),
                            np.int64(n), np.int64(1 if n else 0),
                            np.nan))
                continue
            runs = 1 + int((sign[1:] != sign[:-1]).sum())
            mu = 2.0 * np_ * nn_ / n + 1.0
            var = (2.0 * np_ * nn_ * (2.0 * np_ * nn_ - n)
                   / (float(n) * n * (n - 1)))
            z = (runs - mu) / np.sqrt(var) if var > 0 else np.nan
            out.append((int(np.asarray(kuniq)[k[s]]), np.int64(n),
                        np.int64(runs), float(z)))
        return pd.DataFrame(out, columns=list(cols))

    return (group_apply(ds, per_key, num_partitions=num_partitions,
                        key=key).to_pandas()
            .sort_values(key, kind="mergesort").reset_index(drop=True))


def ks_drift(
    ds: ray.data.Dataset,
    val_col: str = "value",
    ts_col: str = "ts",
    num_partitions: int = 8,
) -> pd.DataFrame:
    """Two-sample Kolmogorov–Smirnov drift statistic between the
    first and second half of the stream (split at the exact global
    median timestamp, like ``psi_drift``): D = max |F₁ − F₂| over
    the int-quantized value support.  EXACT: with cumulative counts
    c₁, c₂ and totals n₁, n₂, D = max |c₁·n₂ − c₂·n₁| / (n₁·n₂) has
    an integer numerator, so engine and SQL agree bit-for-bit before
    one final division.  Per-(value, side) count cells flow through
    one keyed exchange — bounded by distinct quantized values."""
    from .partition import group_apply
    from ..stages.selection import grouped_rank_quantiles

    def kspace(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "g": np.zeros(len(df), np.int8),
            "v": np.rint(df[val_col].to_numpy(np.float64)
                         * 100.0).astype(np.int64),
            "t": df[ts_col].to_numpy("datetime64[us]").view(np.int64),
        })

    mat = ds.select_columns([val_col, ts_col]).map_batches(
        kspace, batch_format="pandas").materialize()
    med = float(grouped_rank_quantiles(
        mat, "g", "t", ps=(0.5,))["q_0"].iloc[0])
    mref = ray.put(med)

    def counts(df: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(mref)
        side = (df["t"].to_numpy(np.int64) > m).astype(np.int64)
        g = (pd.DataFrame({"v": df["v"].to_numpy(np.int64),
                           "side": side})
             .groupby(["v", "side"], as_index=False).size())
        return g.rename(columns={"size": "c"})

    cells = group_apply(
        mat.map_batches(counts, batch_format="pandas"),
        lambda df: df.groupby(["v", "side"], as_index=False)["c"].sum(),
        num_partitions=num_partitions, key="v",
    ).to_pandas()
    piv = (cells.pivot_table(index="v", columns="side", values="c",
                             aggfunc="sum", fill_value=0).sort_index())
    c1 = np.cumsum(piv.get(0, pd.Series(0, index=piv.index))
                   .to_numpy(np.int64))
    c2 = np.cumsum(piv.get(1, pd.Series(0, index=piv.index))
                   .to_numpy(np.int64))
    n1, n2 = int(c1[-1]) if len(c1) else 0, int(c2[-1]) if len(c2) else 0
    if not n1 or not n2:
        return pd.DataFrame({"n_ref": [np.int64(n1)],
                             "n_cur": [np.int64(n2)],
                             "d_num": [np.int64(0)], "ks_d": [np.nan]})
    dnum = np.abs(c1 * n2 - c2 * n1)
    d_num = int(dnum.max())
    return pd.DataFrame({
        "n_ref": [np.int64(n1)], "n_cur": [np.int64(n2)],
        "d_num": [np.int64(d_num)],
        "ks_d": [float(d_num) / (float(n1) * n2)],
    })


def bootstrap_mean_ci(
    ds: ray.data.Dataset,
    key: str = "user_id",
    val_col: str = "value",
    n_boot: int = 200,
    lo_p: float = 0.025,
    hi_p: float = 0.975,
    num_partitions: int = 16,
) -> pd.DataFrame:
    """Percentile-bootstrap confidence interval for the per-key mean
    with DETERMINISTIC resampling: replicate b draws its i-th sample
    as index splitmix64(uid·1000003 + b·10007 + i) mod n over the
    key's (ts,order)-independent value multiset — content-derived,
    partition-order-independent, and exactly reproducible in SQL
    (same arithmetic-hash rule as the engine's samplers).  Replicate
    means have exact int64 numerators; the CI bounds come from the
    shared ``duck_quantile`` kernel over the ``n_boot`` means."""
    from ..oracle.rollup import duck_quantile
    from ..stages.dedup import _splitmix64
    from .partition import group_apply

    def per_key(df: pd.DataFrame) -> pd.DataFrame:
        cols = {key: pd.Series(dtype="int64"),
                "n_events": pd.Series(dtype="int64"),
                "mean_all": pd.Series(dtype="float64"),
                "ci_lo": pd.Series(dtype="float64"),
                "ci_hi": pd.Series(dtype="float64")}
        if not len(df):
            return pd.DataFrame(cols)
        out = []
        kc, kuniq = pd.factorize(df[key])
        vq = np.rint(df[val_col].to_numpy(np.float64) * 100.0).astype(
            np.int64)
        order = np.argsort(kc, kind="stable")
        k, v = kc[order], vq[order]
        starts = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
        ends = np.r_[starts[1:], len(k)]
        for s, e in zip(starts, ends):
            uid = int(np.asarray(kuniq)[k[s]])
            # canonical value order: sorted ascending (resampling
            # must address the same multiset arrangement in SQL)
            vk = np.sort(v[s:e], kind="mergesort")
            n = len(vk)
            b = np.repeat(np.arange(n_boot, dtype=np.uint64), n)
            i = np.tile(np.arange(n, dtype=np.uint64), n_boot)
            x = (np.uint64(uid) * np.uint64(1000003)
                 + b * np.uint64(10007) + i)
            idx = (_splitmix64(x) % np.uint64(n)).astype(np.int64)
            sums = np.bincount(
                (b.astype(np.int64)), weights=vk[idx].astype(np.float64),
                minlength=n_boot)
            means = sums / n / 100.0
            ms = np.sort(means, kind="mergesort")
            out.append((uid, np.int64(n),
                        float(int(vk.sum())) / n / 100.0,
                        float(duck_quantile(ms, lo_p)),
                        float(duck_quantile(ms, hi_p))))
        return pd.DataFrame(out, columns=list(cols))

    return (group_apply(ds, per_key, num_partitions=num_partitions,
                        key=key).to_pandas()
            .sort_values(key, kind="mergesort").reset_index(drop=True))


def jarque_bera(
    ds: ray.data.Dataset,
    key: str = "user_id",
    val_col: str = "value",
    num_partitions: int = 16,
) -> pd.DataFrame:
    """Per-key Jarque–Bera normality statistic over the value column:
    JB = n/6·(g1² + ¼(g2−3)²) with g1 = m3/m2^1.5 (Fisher skew) and
    g2 = m4/m2² (kurtosis) — the moments-based normality gate for
    latency distributions (large JB ⇒ reject Gaussian; the standard
    pre-check before z-score anomaly rules).

    Exactness follows the features_stats taxonomy: the mean is exact
    int-space (cent sums, mu = (Σx/100)/n), the central moments are
    means of float powers of the IDENTICAL double deviations on both
    sides (summation-order ulps stay below round6 — the skew
    argument), and g1/g2/JB close in one mirrored expression.  Keys
    with n < 4 or m2 = 0 are dropped on both sides.  One key-hash
    exchange; per partition one factorize + reduceat."""

    def per_key(df: pd.DataFrame) -> pd.DataFrame:
        cols = {key: pd.Series(dtype="int64"),
                "n": pd.Series(dtype="int64"),
                "skew_g1": pd.Series(dtype="float64"),
                "kurt_g2": pd.Series(dtype="float64"),
                "jb": pd.Series(dtype="float64")}
        if not len(df):
            return pd.DataFrame(cols)
        kc, kuniq = pd.factorize(df[key])
        order = np.argsort(kc, kind="stable")
        k = kc[order]
        v = df[val_col].to_numpy(np.float64)[order]
        x = np.rint(v * 100.0).astype(np.int64)
        starts = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
        n = np.diff(np.r_[starts, len(k)]).astype(np.int64)
        nf = n.astype(np.float64)
        mu = (np.add.reduceat(x, starts).astype(np.float64)
              / 100.0) / nf
        gid = np.cumsum(np.r_[True, k[1:] != k[:-1]]) - 1
        d = v - mu[gid]
        m2 = np.add.reduceat(d * d, starts) / nf
        m3 = np.add.reduceat(d * d * d, starts) / nf
        m4 = np.add.reduceat(d * d * d * d, starts) / nf
        with np.errstate(invalid="ignore", divide="ignore"):
            g1 = m3 / m2 ** 1.5
            g2 = m4 / (m2 * m2)
            jb = nf / 6.0 * (g1 * g1 + 0.25 * (g2 - 3.0) * (g2 - 3.0))
        res = pd.DataFrame({key: np.asarray(kuniq)[k[starts]], "n": n,
                            "skew_g1": g1, "kurt_g2": g2, "jb": jb})
        return res[(res["n"] >= 4) & (m2 > 0.0)]

    out = group_apply(ds, per_key, num_partitions=num_partitions,
                      key=key).to_pandas()
    if out.empty:
        return per_key(pd.DataFrame())
    return out.sort_values(key).reset_index(drop=True)


def welch_ttest(
    ds: ray.data.Dataset,
    key: str = "user_id",
    ts_col: str = "ts",
    val_col: str = "value",
    num_partitions: int = 16,
) -> pd.DataFrame:
    """Per-key Welch two-sample t-test comparing weekday vs weekend
    values: t = (μ_wd − μ_we)/√(s²_wd/n_wd + s²_we/n_we) with the
    Welch–Satterthwaite degrees of freedom — the unequal-variance A/B
    gate (is a user's weekend latency distribution shifted?).

    Day-of-week comes from pure epoch-µs integer arithmetic
    dow = ((µs // 86 400 000 000) + 4) mod 7  (0 = Sunday)
    identically on both sides (no timezone/locale dependence).  All
    sums are exact int64 k-space; means (reported in value units),
    sample variances, t and df close in mirrored float expressions
    v = (q − s·s/n)/(n−1) ;  w_i = v_i/n_i ;
    t = ((s1/n1) − (s2/n2))/100/√(w1+w2) ;
    df = (w1+w2)²/(w1²/(n1−1) + w2²/(n2−1))
    so round-6 outputs are bit-equal.  Keys need ≥ 2 weekday and ≥ 2
    weekend rows and a positive pooled standard error."""

    def per_key(df: pd.DataFrame) -> pd.DataFrame:
        cols = {key: pd.Series(dtype="int64"),
                "n_wd": pd.Series(dtype="int64"),
                "n_we": pd.Series(dtype="int64"),
                "mean_wd": pd.Series(dtype="float64"),
                "mean_we": pd.Series(dtype="float64"),
                "t_stat": pd.Series(dtype="float64"),
                "df_w": pd.Series(dtype="float64")}
        if not len(df):
            return pd.DataFrame(cols)
        kc, kuniq = pd.factorize(df[key])
        tus = df[ts_col].to_numpy("datetime64[us]").view(np.int64)
        dow = (tus // _DAY_US + 4) % 7
        we = ((dow == 0) | (dow == 6)).astype(np.int64)
        x = np.rint(df[val_col].to_numpy(np.float64)
                    * 100.0).astype(np.int64)
        nk = len(kuniq)
        cell = kc * 2 + we
        cnt = np.bincount(cell, minlength=nk * 2).reshape(nk, 2)
        s = np.bincount(cell, weights=x.astype(np.float64),
                        minlength=nk * 2).reshape(nk, 2)
        q = np.bincount(cell, weights=(x * x).astype(np.float64),
                        minlength=nk * 2).reshape(nk, 2)
        n1, n2 = cnt[:, 0].astype(np.float64), cnt[:, 1].astype(np.float64)
        s1, s2 = s[:, 0], s[:, 1]
        q1, q2 = q[:, 0], q[:, 1]
        with np.errstate(invalid="ignore", divide="ignore"):
            v1 = (q1 - s1 * s1 / n1) / (n1 - 1.0)
            v2 = (q2 - s2 * s2 / n2) / (n2 - 1.0)
            w1, w2 = v1 / n1, v2 / n2
            se2 = w1 + w2
            t = ((s1 / n1) - (s2 / n2)) / 100.0 / np.sqrt(se2)
            dfw = (se2 * se2
                   / (w1 * w1 / (n1 - 1.0) + w2 * w2 / (n2 - 1.0)))
            res = pd.DataFrame({
                key: np.asarray(kuniq),
                "n_wd": cnt[:, 0].astype(np.int64),
                "n_we": cnt[:, 1].astype(np.int64),
                "mean_wd": (s1 / n1) / 100.0,
                "mean_we": (s2 / n2) / 100.0,
                "t_stat": t, "df_w": dfw})
        return res[(res["n_wd"] >= 2) & (res["n_we"] >= 2) & (se2 > 0.0)]

    out = group_apply(ds, per_key, num_partitions=num_partitions,
                      key=key).to_pandas()
    if out.empty:
        return per_key(pd.DataFrame())
    return out.sort_values(key).reset_index(drop=True)


def markov_entropy_rate(
    ds: ray.data.Dataset,
    key: str = "user_id",
    attr: str = "event_type",
    ts_col: str = "ts",
    order: str = "event_id",
    num_partitions: int = 16,
) -> pd.DataFrame:
    """Per-key entropy rate of the first-order Markov chain over the
    (ts, order)-sorted ``attr`` stream: with transition counts c_ab
    and from-state totals c_a, H = −Σ_ab (c_ab/T)·ln(c_ab/c_a) nats
    per step (T = total transitions) — 0 for a fully deterministic
    next-event-type process, ln|A| for uniform noise; the
    sequence-predictability gate behind next-action modelling
    (the per-key scalar twin of the corpus ``transition_matrix`` /
    ``transition_pmi``).

    All counts are exact int64 (one bincount over fused
    key×from×to codes — the transition_matrix kernel); H closes in a
    per-key weighted log sum mirrored by the SQL oracle (round-6
    robust: ln terms sit far from rounding boundaries).  Keys need
    T ≥ 1 transition.  One key-hash exchange; no per-key Python."""

    def per_key(df: pd.DataFrame) -> pd.DataFrame:
        cols = {key: pd.Series(dtype="int64"),
                "n_trans": pd.Series(dtype="int64"),
                "entropy_rate": pd.Series(dtype="float64")}
        if not len(df):
            return pd.DataFrame(cols)
        kc, kuniq = pd.factorize(df[key])
        tus = df[ts_col].to_numpy("datetime64[us]").view(np.int64)
        oid = df[order].to_numpy(np.int64)
        acode, alphabet = pd.factorize(df[attr])
        perm = np.lexsort((oid, tus, kc))
        k, a = kc[perm], acode[perm].astype(np.int64)
        same = k[1:] == k[:-1]
        na = len(alphabet)
        nk = len(kuniq)
        kf = k[:-1][same]
        af, at = a[:-1][same], a[1:][same]
        trip = (kf * na + af) * na + at
        c = np.bincount(trip, minlength=nk * na * na).astype(np.int64)
        ca = np.bincount(kf * na + af, minlength=nk * na).astype(np.int64)
        tt = np.bincount(kf, minlength=nk).astype(np.int64)
        nz = np.flatnonzero(c)
        cf = c[nz].astype(np.float64)
        caf = ca[nz // na].astype(np.float64)
        kidx = nz // (na * na)
        sumw = np.bincount(kidx, weights=cf * np.log(cf / caf),
                           minlength=nk)
        with np.errstate(invalid="ignore", divide="ignore"):
            h = -(sumw) / tt.astype(np.float64)
        res = pd.DataFrame({key: np.asarray(kuniq),
                            "n_trans": tt, "entropy_rate": h})
        return res[res["n_trans"] >= 1]

    out = group_apply(ds, per_key, num_partitions=num_partitions,
                      key=key).to_pandas()
    if out.empty:
        return per_key(pd.DataFrame())
    return out.sort_values(key).reset_index(drop=True)


def theil_index(
    ds: ray.data.Dataset,
    key: str = "user_id",
    num_partitions: int = 16,
) -> pd.DataFrame:
    """Corpus-level Theil T inequality index of per-key event counts,
    T = Σ_u (c_u/C)·ln(c_u/μ) with μ = C/U — the entropy-based twin
    of ``gini_activity`` (0 for perfectly even traffic, ln U when one
    key owns everything; decomposable across groups, which Gini is
    not).  Computed via the identity T = (Σ c_u ln c_u)/C − ln(C/U)
    so the distributed pass only needs per-partition partials of the
    EXACT int totals (C, U) and the float Σ c_u ln c_u (each c_u is
    exact after the key exchange; the cross-partition float add is
    round-6 robust).  One key-hash exchange reducing to one row per
    partition; single-row output."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"u": pd.Series(dtype="int64"),
                                 "c": pd.Series(dtype="int64"),
                                 "s1": pd.Series(dtype="float64")})
        cnt = df.groupby(key, sort=False).size().to_numpy(np.int64)
        cf = cnt.astype(np.float64)
        return pd.DataFrame({"u": [len(cnt)], "c": [int(cnt.sum())],
                             "s1": [float((cf * np.log(cf)).sum())]})

    parts = group_apply(ds, partial, num_partitions=num_partitions,
                        key=key).to_pandas()
    u = int(parts["u"].sum())
    c = int(parts["c"].sum())
    if u == 0 or c == 0:
        return pd.DataFrame({"n_users": pd.Series(dtype="int64"),
                             "total": pd.Series(dtype="int64"),
                             "theil": pd.Series(dtype="float64")})
    s1 = float(parts["s1"].sum())
    cf, uf = float(c), float(u)
    return pd.DataFrame({"n_users": [u], "total": [c],
                         "theil": [s1 / cf - np.log(cf / uf)]})


def rising_keys(
    ds: ray.data.Dataset,
    key: str = "user_id",
    ts_col: str = "ts",
    num_partitions: int = 16,
) -> pd.DataFrame:
    """Share-drift detector: split the dataset's time range at its
    midpoint (µs midpoint of [min ts, max ts]), count each key's
    events in the two halves (c₁, c₂ with totals T₁, T₂), and score
    drift by the EXACT integer cross-multiplied share difference
    score = c₂·T₁ − c₁·T₂ (> 0 ⇔ the key's share of traffic rose) —
    the "which conversations are heating up?" gate with a float-free
    ordering (no round-6 rank instability).  The mirrored float
    ``share_delta`` = c₂/T₂ − c₁/T₁ is attached for human units.

    Two passes: a cheap min/max ts aggregate, then one key-hash
    exchange producing exact per-key half counts.  Keys in only one
    half get c = 0 in the other, score still exact.  Drops keys with
    score = 0 (stable keys) to bound output to the drifting set."""

    lohi = ds.select_columns([ts_col]).aggregate(
        ray.data.aggregate.Min(ts_col), ray.data.aggregate.Max(ts_col))
    lo = pd.Timestamp(lohi[f"min({ts_col})"]).value // 1000
    hi = pd.Timestamp(lohi[f"max({ts_col})"]).value // 1000
    mid = (lo + hi) // 2

    def per_key(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({key: pd.Series(dtype="int64"),
                                 "c1": pd.Series(dtype="int64"),
                                 "c2": pd.Series(dtype="int64")})
        kc, kuniq = pd.factorize(df[key])
        t = df[ts_col].to_numpy("datetime64[us]").view(np.int64)
        second = t > mid
        nk = len(kuniq)
        c1 = np.bincount(kc[~second], minlength=nk).astype(np.int64)
        c2 = np.bincount(kc[second], minlength=nk).astype(np.int64)
        return pd.DataFrame({key: np.asarray(kuniq),
                             "c1": c1, "c2": c2})

    per = group_apply(ds, per_key, num_partitions=num_partitions,
                      key=key).to_pandas()
    cols = {key: pd.Series(dtype="int64"),
            "c1": pd.Series(dtype="int64"),
            "c2": pd.Series(dtype="int64"),
            "score": pd.Series(dtype="int64"),
            "share_delta": pd.Series(dtype="float64")}
    if per.empty:
        return pd.DataFrame(cols)
    t1 = int(per["c1"].sum())
    t2 = int(per["c2"].sum())
    c1 = per["c1"].to_numpy(np.int64)
    c2 = per["c2"].to_numpy(np.int64)
    score = c2 * t1 - c1 * t2
    with np.errstate(invalid="ignore", divide="ignore"):
        delta = c2.astype(np.float64) / float(t2) \
            - c1.astype(np.float64) / float(t1)
    res = pd.DataFrame({key: per[key].to_numpy(np.int64),
                        "c1": c1, "c2": c2, "score": score,
                        "share_delta": delta})
    return (res[res["score"] != 0]
            .sort_values(key).reset_index(drop=True))


def rfm_segmentation(
    ds: ray.data.Dataset,
    key: str = "user_id",
    ts_col: str = "ts",
    val_col: str = "value",
    num_partitions: int = 16,
) -> pd.DataFrame:
    """Classic RFM customer segmentation: per key the Recency
    (µs from the key's last event to the global max timestamp),
    Frequency (event count) and Monetary (Σvalue) aggregates, each
    mapped to a 1–5 score by exact integer rank quintiles —
    score = 5 − ⌊(rank−1)·5/N⌋ with rank ordered best-first
    (recency ascending, frequency/monetary descending) and ties
    broken deterministically by key — plus the combined
    ``rfm = 100·r + 10·f + m`` cell.

    Everything is integer-exact: µs recencies, counts, k-space value
    sums and the rank arithmetic (the SQL twin uses the identical
    ``row_number()`` ordering and floor division); the only float is
    the monetary descale /100.  One key-hash exchange reduces the
    stream to one row per key; scoring is a rank pass over that
    reduced table (keys ≪ rows — at larger scale swap the driver
    pass for ds.sort, same semantics)."""
    from .partition import group_apply

    def per_key(df: pd.DataFrame) -> pd.DataFrame:
        tus = df[ts_col].to_numpy("datetime64[us]").view(np.int64)
        v = np.rint(df[val_col].to_numpy(np.float64)
                    * 100.0).astype(np.int64)
        tmp = pd.DataFrame({key: df[key].to_numpy(),
                            "t": tus, "v": v})
        a = tmp.groupby(key, as_index=False, observed=True).agg(
            last_t=("t", "max"), freq=("t", "size"), mon=("v", "sum"))
        return a

    cells = group_apply(
        ds.select_columns([key, ts_col, val_col]),
        per_key, num_partitions=num_partitions, key=key,
    ).to_pandas()
    cols = {key: pd.Series(dtype="int64"),
            "recency_us": pd.Series(dtype="int64"),
            "freq": pd.Series(dtype="int64"),
            "monetary": pd.Series(dtype="float64"),
            "r_score": pd.Series(dtype="int64"),
            "f_score": pd.Series(dtype="int64"),
            "m_score": pd.Series(dtype="int64"),
            "rfm": pd.Series(dtype="int64")}
    if not len(cells):
        return pd.DataFrame(cols)
    hi = int(cells["last_t"].max())
    uid = cells[key].to_numpy()
    rec = hi - cells["last_t"].to_numpy(np.int64)
    freq = cells["freq"].to_numpy(np.int64)
    mon = cells["mon"].to_numpy(np.int64)
    n = len(uid)

    def score(order_key, asc):
        # rank 1 = best; ties broken by key ascending
        perm = np.lexsort((uid, order_key if asc else -order_key))
        rn = np.empty(n, np.int64)
        rn[perm] = np.arange(1, n + 1)
        return 5 - (rn - 1) * 5 // n

    r_s = score(rec, True)
    f_s = score(freq, False)
    m_s = score(mon, False)
    out = pd.DataFrame({key: uid, "recency_us": rec, "freq": freq,
                        "monetary": mon.astype(np.float64) / 100.0,
                        "r_score": r_s, "f_score": f_s,
                        "m_score": m_s,
                        "rfm": 100 * r_s + 10 * f_s + m_s})
    return out.sort_values(key).reset_index(drop=True)


def basket_lift(
    ds: ray.data.Dataset,
    key: str = "user_id",
    item_col: str = "event_type",
    num_partitions: int = 16,
) -> pd.DataFrame:
    """Market-basket association over users-as-baskets: for every
    unordered item pair (a < b), the distinct-user co-occurrence
    count, support = n_both/N and
    lift = N·n_both/(n_a·n_b) — lift > 1 flags items attracting the
    same users (the cross-feature signal behind bundling /
    next-event-type suggestions), < 1 repulsion.

    Distributed shape: a map-side distinct (user, item) partial
    per block, ONE user-keyed exchange, then each partition reduces
    its users to pair / single / distinct-user cells (bounded by
    |items|² per partition, not by rows) that sum driver-side.  All
    counts exact int64; support and lift close in mirrored float
    expressions."""
    from .partition import group_apply

    def distinct_partial(df: pd.DataFrame) -> pd.DataFrame:
        return df[[key, item_col]].drop_duplicates()

    def cells(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates()
        m = d.merge(d, on=key)
        ax, bx = item_col + "_x", item_col + "_y"
        p = m[m[ax] < m[bx]]
        pc = p.groupby([ax, bx], as_index=False, observed=True).size()
        sc = d.groupby(item_col, as_index=False, observed=True).size()
        out = pd.concat([
            pd.DataFrame({"kind": "p", "a": pc[ax].to_numpy(object),
                          "b": pc[bx].to_numpy(object),
                          "cnt": pc["size"].to_numpy(np.int64)}),
            pd.DataFrame({"kind": "s", "a": sc[item_col]
                          .to_numpy(object), "b": "",
                          "cnt": sc["size"].to_numpy(np.int64)}),
            pd.DataFrame({"kind": ["n"], "a": [""], "b": [""],
                          "cnt": [np.int64(d[key].nunique())]}),
        ], ignore_index=True)
        return out

    parts = group_apply(
        ds.select_columns([key, item_col]).map_batches(
            distinct_partial, batch_format="pandas"),
        cells, num_partitions=num_partitions, key=key,
    ).to_pandas()
    cols = {"type_a": pd.Series(dtype=object),
            "type_b": pd.Series(dtype=object),
            "n_a": pd.Series(dtype="int64"),
            "n_b": pd.Series(dtype="int64"),
            "n_both": pd.Series(dtype="int64"),
            "support": pd.Series(dtype="float64"),
            "lift": pd.Series(dtype="float64")}
    if parts.empty:
        return pd.DataFrame(cols)
    agg = parts.groupby(["kind", "a", "b"], as_index=False,
                        observed=True)["cnt"].sum()
    n_users = int(agg.loc[agg["kind"] == "n", "cnt"].sum())
    singles = dict(zip(agg.loc[agg["kind"] == "s", "a"],
                       agg.loc[agg["kind"] == "s", "cnt"]))
    pr = agg[agg["kind"] == "p"]
    if pr.empty or n_users == 0:
        return pd.DataFrame(cols)
    na = pr["a"].map(singles).to_numpy(np.int64)
    nb = pr["b"].map(singles).to_numpy(np.int64)
    nboth = pr["cnt"].to_numpy(np.int64)
    support = nboth.astype(np.float64) / np.float64(n_users)
    lift = nboth.astype(np.float64) * np.float64(n_users) \
        / (na * nb).astype(np.float64)
    out = pd.DataFrame({"type_a": pr["a"].to_numpy(object),
                        "type_b": pr["b"].to_numpy(object),
                        "n_a": na, "n_b": nb, "n_both": nboth,
                        "support": support, "lift": lift})
    return out.sort_values(["type_a", "type_b"]).reset_index(drop=True)


def pareto_concentration(
    ds: ray.data.Dataset,
    key: str = "user_id",
    pcts: tuple = (1, 5, 10, 25, 50),
    num_partitions: int = 16,
) -> pd.DataFrame:
    """Activity-concentration (Lorenz) curve points: for each
    percentile p of keys, the share of all events produced by the
    top-p% busiest keys (count-descending, key-ascending tie-break)
    — the "what fraction of traffic is the hot head" planning number
    behind salting/LPT decisions, read pointwise where gini/theil
    give one index.

    Per-key counts reduce through one keyed exchange (map-side
    partial counts first); ranking and the cumulative prefix run on
    the one-row-per-key table (swap for a distributed sort beyond
    ~10⁸ keys).  Cut ranks use exact integer arithmetic
    k = max(1, p·N//100) matching the twin's row_number/greatest;
    the share is the only float closing."""
    from .partition import group_apply

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(key, as_index=False, observed=True).size()
        return g.rename(columns={"size": "cnt"})

    counts = group_apply(
        ds.select_columns([key]).map_batches(partial,
                                             batch_format="pandas"),
        lambda df: df.groupby(key, as_index=False,
                              observed=True)["cnt"].sum(),
        num_partitions=num_partitions, key=key,
    ).to_pandas()
    cols = {"pct": pd.Series(dtype="int64"),
            "n_top_keys": pd.Series(dtype="int64"),
            "top_events": pd.Series(dtype="int64"),
            "share": pd.Series(dtype="float64")}
    if counts.empty:
        return pd.DataFrame(cols)
    c = counts["cnt"].to_numpy(np.int64)
    uid = counts[key].to_numpy()
    perm = np.lexsort((uid, -c))
    cs = np.cumsum(c[perm])
    n = len(c)
    total = int(cs[-1])
    rows = []
    for p in pcts:
        k = max(1, int(p) * n // 100)
        top = int(cs[k - 1])
        rows.append((np.int64(p), np.int64(k), np.int64(top),
                     float(top) / float(total)))
    return pd.DataFrame(rows, columns=list(cols))


def rank_compare(
    ds: ray.data.Dataset,
    type_col: str = "event_type",
    val_col: str = "value",
) -> pd.DataFrame:
    """Pairwise Mann–Whitney U with tie-corrected normal z plus
    Cliff's delta for EVERY ordered pair of categories (a < b) of a
    bounded-alphabet column — the nonparametric "do these two event
    types draw different value distributions" gate, robust where
    welch_ttest assumes normality; Cliff's δ = (gt − lt)/(n_a·n_b)
    is its effect size.

    Everything reduces to (category, quantized-value) histogram
    cells: per-block partials combine driver-side (cells bounded by
    |alphabet| × |value domain|, never by rows — the table_profile
    contract), then per-pair prefix sums give the exact int64
    greater/less/equal pair counts, doubled rank-sum
    U₂ = 2·gt + eq, and the tie term Σ(t³−t).  Only z and δ close
    in float, mirrored term-for-term by the SQL twin's window
    frames."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        v = df[val_col].to_numpy(np.float64)
        ok = ~np.isnan(v)                   # mirror: WHERE value IS NOT NULL
        k = np.rint(v[ok] * 100.0).astype(np.int64)
        g = pd.DataFrame({"t": df[type_col].to_numpy(object)[ok],
                          "k": k}).groupby(
            ["t", "k"], as_index=False, observed=True).size()
        return g.rename(columns={"size": "c"})

    parts = ds.select_columns([type_col, val_col]).map_batches(
        partial, batch_format="pandas").to_pandas()
    cols = {"type_a": pd.Series(dtype=object),
            "type_b": pd.Series(dtype=object),
            "n_a": pd.Series(dtype="int64"),
            "n_b": pd.Series(dtype="int64"),
            "u_twice": pd.Series(dtype="int64"),
            "gt_pairs": pd.Series(dtype="int64"),
            "lt_pairs": pd.Series(dtype="int64"),
            "eq_pairs": pd.Series(dtype="int64"),
            "z_score": pd.Series(dtype="float64"),
            "cliffs_delta": pd.Series(dtype="float64")}
    if parts.empty:
        return pd.DataFrame(cols)
    cells = parts.groupby(["t", "k"], as_index=False,
                          observed=True)["c"].sum()
    types = sorted(cells["t"].unique())
    rows = []
    for i, ta in enumerate(types):
        for tb in types[i + 1:]:
            sub = cells[cells["t"].isin([ta, tb])]
            h = sub.pivot_table(index="k", columns="t", values="c",
                                fill_value=0, aggfunc="sum")
            ks = h.index.to_numpy(np.int64)
            ca = h[ta].to_numpy(np.int64)
            cb = h[tb].to_numpy(np.int64)
            na, nb = int(ca.sum()), int(cb.sum())
            if na == 0 or nb == 0:
                continue
            cb_less = np.cumsum(cb) - cb
            ca_less = np.cumsum(ca) - ca
            gt = int((ca * cb_less).sum())
            lt = int((cb * ca_less).sum())
            eq = int((ca * cb).sum())
            t = ca + cb
            st = int((t * t * t - t).sum())
            u2 = 2 * gt + eq
            naf, nbf = float(na), float(nb)
            nf = float(na + nb)
            sigma2 = (naf * nbf / 12.0) * (
                (nf + 1.0) - float(st) / (nf * (nf - 1.0)))
            z = (float(u2) - naf * nbf) / (2.0 * np.sqrt(sigma2)) \
                if sigma2 > 0 else np.nan
            delta = float(gt - lt) / (naf * nbf)
            rows.append((ta, tb, np.int64(na), np.int64(nb),
                         np.int64(u2), np.int64(gt), np.int64(lt),
                         np.int64(eq), z, delta))
    if not rows:
        return pd.DataFrame(cols)
    return pd.DataFrame(rows, columns=list(cols))


def kruskal_wallis(
    ds: ray.data.Dataset,
    type_col: str = "event_type",
    val_col: str = "value",
) -> pd.DataFrame:
    """Kruskal–Wallis rank test across ALL categories of a bounded-
    alphabet column at once — the k-group extension of rank_compare's
    pairwise Mann–Whitney: doubled rank sums 2R_i per group are EXACT
    int64 from the global value histogram (2·avg_rank(v) =
    2·cnt_less + t_v + 1), and
    H = 12/(N(N+1))·Σ R_i²/n_i − 3(N+1), tie-corrected by
    1 − Σ(t³−t)/(N³−N), closes in float.  Output is one row per
    group (n_i, r_twice exact) with the shared H columns repeated —
    the maximal oracle surface.

    Same distributed shape as rank_compare: per-block histogram
    partials, driver-side cells bounded by |alphabet|·|value
    domain|.  Int64 bound: (2R_i)² < 2⁶³ ⇒ N·n_i ≲ 1.5·10⁹ pairs
    (lift to float beyond — sandbox is ≪ that)."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        v = df[val_col].to_numpy(np.float64)
        ok = ~np.isnan(v)
        k = np.rint(v[ok] * 100.0).astype(np.int64)
        g = pd.DataFrame({"t": df[type_col].to_numpy(object)[ok],
                          "k": k}).groupby(
            ["t", "k"], as_index=False, observed=True).size()
        return g.rename(columns={"size": "c"})

    parts = ds.select_columns([type_col, val_col]).map_batches(
        partial, batch_format="pandas").to_pandas()
    cols = {"event_type": pd.Series(dtype=object),
            "n_i": pd.Series(dtype="int64"),
            "r_twice": pd.Series(dtype="int64"),
            "n_total": pd.Series(dtype="int64"),
            "h_stat": pd.Series(dtype="float64"),
            "h_tie": pd.Series(dtype="float64")}
    if parts.empty:
        return pd.DataFrame(cols)
    cells = parts.groupby(["t", "k"], as_index=False,
                          observed=True)["c"].sum()
    gk = cells.groupby("k")["c"].sum().sort_index()
    ks = gk.index.to_numpy(np.int64)
    tk = gk.to_numpy(np.int64)
    less = np.cumsum(tk) - tk
    avg2 = 2 * less + tk + 1                 # 2·average rank of k
    a2 = dict(zip(ks, avg2))
    cells["a2"] = cells["k"].map(a2).astype(np.int64)
    r = cells.assign(prod=cells["c"] * cells["a2"]).groupby(
        "t", as_index=False).agg(n_i=("c", "sum"),
                                 r_twice=("prod", "sum"))
    r = r.sort_values("t").reset_index(drop=True)
    n = int(r["n_i"].sum())
    if n < 2:
        return pd.DataFrame(cols)
    nf = float(n)
    r2 = r["r_twice"].to_numpy(np.int64)
    ni = r["n_i"].to_numpy(np.int64)
    s2 = float(np.sum(r2.astype(np.float64) * r2.astype(np.float64)
                      / (4.0 * ni.astype(np.float64))))
    h = 12.0 / (nf * (nf + 1.0)) * s2 - 3.0 * (nf + 1.0)
    st = int((tk * tk * tk - tk).sum())
    h_tie = h / (1.0 - float(st) / (nf * nf * nf - nf))
    return pd.DataFrame({
        "event_type": r["t"].to_numpy(object),
        "n_i": ni, "r_twice": r2,
        "n_total": np.full(len(r), n, dtype=np.int64),
        "h_stat": np.full(len(r), h),
        "h_tie": np.full(len(r), h_tie)})


def activity_corr_pairs(
    ds: ray.data.Dataset,
    key: str = "user_id",
    ts_col: str = "ts",
    top_n: int = 20,
    num_partitions: int = 16,
) -> pd.DataFrame:
    """Pairwise Pearson correlation of HOURLY ACTIVITY between the
    top-N busiest keys: each key's event counts on the shared dense
    hourly grid [min, max] over the selected keys form a vector, and
    every unordered key pair gets
    r = (H·Σxy − Σx·Σy)/√((H·Σx² − (Σx)²)(H·Σy² − (Σy)²)) — the
    who-moves-with-whom synchrony matrix (bot farms / shared
    schedules show as near-1 blocks) that single-key autocorrelation
    cannot see.

    Selection is deterministic (count desc, key asc — the top_users
    rule); every sum is EXACT int64 (zero hours contribute nothing
    to Σxy, so only co-active cells are touched); r is the single
    mirrored float closing.  Two keyed exchanges (per-key counts,
    then (key,hour) cells for the N keys); the N²/2 closing runs on
    cells, not rows."""
    from .partition import group_apply

    def cnt_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(key, as_index=False, observed=True).size()
        return g.rename(columns={"size": "cnt"})

    counts = group_apply(
        ds.select_columns([key]).map_batches(cnt_partial,
                                             batch_format="pandas"),
        lambda df: df.groupby(key, as_index=False,
                              observed=True)["cnt"].sum(),
        num_partitions=num_partitions, key=key,
    ).to_pandas()
    cols = {"user_a": pd.Series(dtype="int64"),
            "user_b": pd.Series(dtype="int64"),
            "n_hours": pd.Series(dtype="int64"),
            "sxy": pd.Series(dtype="int64"),
            "r": pd.Series(dtype="float64")}
    if counts.empty:
        return pd.DataFrame(cols)
    c = counts["cnt"].to_numpy(np.int64)
    u = counts[key].to_numpy(np.int64)
    perm = np.lexsort((u, -c))[:top_n]
    chosen = np.sort(u[perm])

    def hour_cells(df: pd.DataFrame) -> pd.DataFrame:
        m = np.isin(df[key].to_numpy(), chosen)
        d = df.loc[m]
        hb = d[ts_col].to_numpy("datetime64[us]").view(np.int64) \
            // 3_600_000_000
        g = pd.DataFrame({key: d[key].to_numpy(np.int64),
                          "hb": hb}).groupby(
            [key, "hb"], as_index=False, observed=True).size()
        return g.rename(columns={"size": "c"})

    cells = group_apply(
        ds.select_columns([key, ts_col]).map_batches(
            hour_cells, batch_format="pandas"),
        lambda df: df.groupby([key, "hb"], as_index=False,
                              observed=True)["c"].sum(),
        num_partitions=num_partitions, key=key,
    ).to_pandas()
    if cells.empty:
        return pd.DataFrame(cols)
    H = int(cells["hb"].max() - cells["hb"].min() + 1)
    per = {}
    for uid, g in cells.groupby(key):
        hb = g["hb"].to_numpy(np.int64)
        cc = g["c"].to_numpy(np.int64)
        per[int(uid)] = (dict(zip(hb, cc)), int(cc.sum()),
                         int((cc * cc).sum()))
    rows = []
    Hf = float(H)
    for i, ua in enumerate(chosen):
        if int(ua) not in per:
            continue
        da, sa, qa = per[int(ua)]
        for ub in chosen[i + 1:]:
            if int(ub) not in per:
                continue
            db, sb, qb = per[int(ub)]
            small, big = (da, db) if len(da) <= len(db) else (db, da)
            sxy = int(sum(v * big.get(k, 0)
                          for k, v in small.items()))
            num = H * sxy - sa * sb
            dena = H * qa - sa * sa
            denb = H * qb - sb * sb
            if dena <= 0 or denb <= 0:      # zero-variance key (twin
                continue                    # drops it too)
            r = float(num) / np.sqrt(float(dena * denb))
            rows.append((np.int64(ua), np.int64(ub), np.int64(H),
                         np.int64(sxy), r))
    if not rows:
        return pd.DataFrame(cols)
    return pd.DataFrame(rows, columns=list(cols))


def anova_f(
    ds: ray.data.Dataset,
    type_col: str = "event_type",
    val_col: str = "value",
) -> pd.DataFrame:
    """Classic one-way ANOVA across ALL categories of a bounded-
    alphabet column: between/within sums of squares from EXACT int64
    per-group moments (n_i, Σx, Σx² in k-space),
    F = (SSB/(k−1))/(SSW/(N−k)) and the effect size η² = SSB/SST —
    the parametric k-group complement to kruskal_wallis (equal-means
    gate under normality; read them together: F significant + H not
    ⇒ suspect outliers).  Output is one row per group with the exact
    moments as oracle surface and the shared F/η² repeated.

    Per-block moment partials; driver-side closing over |alphabet|
    cells.  Mirrored float ops: tᵢ = (Σxᵢ)²/nᵢ in doubles, grand
    term S²/N, the two ratios."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        v = df[val_col].to_numpy(np.float64)
        ok = ~np.isnan(v)
        k = np.rint(v[ok] * 100.0).astype(np.int64)
        g = pd.DataFrame({"t": df[type_col].to_numpy(object)[ok],
                          "k": k, "k2": k * k}).groupby(
            "t", as_index=False, observed=True).agg(
            n=("k", "size"), s=("k", "sum"), q=("k2", "sum"))
        return g

    parts = ds.select_columns([type_col, val_col]).map_batches(
        partial, batch_format="pandas").to_pandas()
    cols = {"event_type": pd.Series(dtype=object),
            "n_i": pd.Series(dtype="int64"),
            "s_i": pd.Series(dtype="int64"),
            "q_i": pd.Series(dtype="int64"),
            "f_stat": pd.Series(dtype="float64"),
            "eta_sq": pd.Series(dtype="float64")}
    if parts.empty:
        return pd.DataFrame(cols)
    g = parts.groupby("t", as_index=False).agg(
        n_i=("n", "sum"), s_i=("s", "sum"), q_i=("q", "sum"))
    g = g.sort_values("t").reset_index(drop=True)
    kg = len(g)
    N = int(g["n_i"].sum())
    if kg < 2 or N <= kg:
        return pd.DataFrame(cols)
    sf_ = g["s_i"].to_numpy(np.int64).astype(np.float64)
    nf_ = g["n_i"].to_numpy(np.int64).astype(np.float64)
    tsum = float(np.sum(sf_ * sf_ / nf_))
    S = float(int(g["s_i"].sum()))
    Q = float(int(g["q_i"].sum()))
    Nf = float(N)
    ssb = tsum - S * S / Nf
    sst = Q - S * S / Nf
    ssw = Q - tsum
    if ssw <= 0 or sst <= 0:
        return pd.DataFrame(cols)
    f = (ssb / (kg - 1.0)) / (ssw / (Nf - kg))
    eta = ssb / sst
    return pd.DataFrame({
        "event_type": g["t"].to_numpy(object),
        "n_i": g["n_i"].to_numpy(np.int64),
        "s_i": g["s_i"].to_numpy(np.int64),
        "q_i": g["q_i"].to_numpy(np.int64),
        "f_stat": np.full(kg, f),
        "eta_sq": np.full(kg, eta)})


def cramers_v(
    ds: ray.data.Dataset,
    col_a: str = "lang",
    col_b: str = "source",
) -> pd.DataFrame:
    """Cramér's V association strength between two bounded-alphabet
    columns: the χ² of independence over the full r×c grid
    (zero cells included) normalized to [0, 1] by
    V = √(χ²/(N·(min(r,c)−1))) — the effect size the raw χ² (which
    grows with N) cannot give; the documents-table companion to
    chi_square_independence on events.

    Observed counts are exact int64 map-side cells; expected counts,
    χ² and V close in the mirrored float grid sum (the chi_square
    oracle idiom)."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby([col_a, col_b], as_index=False,
                       observed=True).size()
        return g.rename(columns={"size": "o"})

    parts = ds.select_columns([col_a, col_b]).map_batches(
        partial, batch_format="pandas").to_pandas()
    cols = {"n_rows": pd.Series(dtype="int64"),
            "n_classes_a": pd.Series(dtype="int64"),
            "n_classes_b": pd.Series(dtype="int64"),
            "dof": pd.Series(dtype="int64"),
            "chi2": pd.Series(dtype="float64"),
            "cramers_v": pd.Series(dtype="float64")}
    if parts.empty:
        return pd.DataFrame(cols)
    cells = parts.groupby([col_a, col_b], as_index=False,
                          observed=True)["o"].sum()
    piv = cells.pivot_table(index=col_a, columns=col_b, values="o",
                            fill_value=0, aggfunc="sum")
    o = piv.to_numpy(np.int64)
    r = o.sum(axis=1).astype(np.int64)
    c = o.sum(axis=0).astype(np.int64)
    n = int(o.sum())
    ra, cb = len(r), len(c)
    if n == 0 or ra < 2 or cb < 2:
        return pd.DataFrame(cols)
    nf = float(n)
    e = r.astype(np.float64)[:, None] * c.astype(np.float64)[None, :] \
        / nf
    chi2 = float(np.sum((o.astype(np.float64) - e) ** 2 / e))
    v = float(np.sqrt(chi2 / (nf * (min(ra, cb) - 1.0))))
    return pd.DataFrame({
        "n_rows": [np.int64(n)], "n_classes_a": [np.int64(ra)],
        "n_classes_b": [np.int64(cb)],
        "dof": [np.int64((ra - 1) * (cb - 1))],
        "chi2": [chi2], "cramers_v": [v]})


def levene_bf(
    ds: ray.data.Dataset,
    type_col: str = "event_type",
    val_col: str = "value",
) -> pd.DataFrame:
    """Brown–Forsythe (median-based Levene) test of variance
    homogeneity across categories: each observation becomes its
    absolute deviation from the GROUP MEDIAN and a one-way ANOVA F
    runs on those deviations — the robust are-the-spreads-equal gate
    that validates anova_f's equal-variance assumption (read W
    before trusting F).

    Exactness: medians come from the per-group value histogram in
    doubled k-space (2·median is always integer), deviations
    |2k − 2med| stay exact int64 cell-weighted, and only the final
    F ratio closes in mirrored floats.  Per-block histogram
    partials; driver closing over |alphabet|·|domain| cells."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        v = df[val_col].to_numpy(np.float64)
        ok = ~np.isnan(v)
        k = np.rint(v[ok] * 100.0).astype(np.int64)
        g = pd.DataFrame({"t": df[type_col].to_numpy(object)[ok],
                          "k": k}).groupby(
            ["t", "k"], as_index=False, observed=True).size()
        return g.rename(columns={"size": "c"})

    parts = ds.select_columns([type_col, val_col]).map_batches(
        partial, batch_format="pandas").to_pandas()
    cols = {"event_type": pd.Series(dtype=object),
            "n_i": pd.Series(dtype="int64"),
            "med2": pd.Series(dtype="int64"),
            "s_i": pd.Series(dtype="int64"),
            "q_i": pd.Series(dtype="int64"),
            "w_stat": pd.Series(dtype="float64")}
    if parts.empty:
        return pd.DataFrame(cols)
    cells = parts.groupby(["t", "k"], as_index=False,
                          observed=True)["c"].sum()
    rows = []
    for t, g in cells.groupby("t"):
        g = g.sort_values("k")
        ks = g["k"].to_numpy(np.int64)
        cc = g["c"].to_numpy(np.int64)
        n = int(cc.sum())
        cum = np.cumsum(cc)
        lo = int(ks[np.searchsorted(cum, (n - 1) // 2 + 1)])
        hi = int(ks[np.searchsorted(cum, n // 2 + 1)])
        m2 = lo + hi                       # 2·median, exact
        dev = np.abs(2 * ks - m2)
        s = int((cc * dev).sum())
        q = int((cc * dev * dev).sum())
        rows.append((t, n, m2, s, q))
    r = pd.DataFrame(rows, columns=["t", "n_i", "med2", "s_i", "q_i"])
    r = r.sort_values("t").reset_index(drop=True)
    kg = len(r)
    N = int(r["n_i"].sum())
    if kg < 2 or N <= kg:
        return pd.DataFrame(cols)
    sf_ = r["s_i"].to_numpy(np.int64).astype(np.float64)
    nf_ = r["n_i"].to_numpy(np.int64).astype(np.float64)
    tsum = float(np.sum(sf_ * sf_ / nf_))
    S = float(int(r["s_i"].sum()))
    Q = float(int(r["q_i"].sum()))
    Nf = float(N)
    ssb = tsum - S * S / Nf
    ssw = Q - tsum
    if ssw <= 0:
        return pd.DataFrame(cols)
    w = (ssb / (kg - 1.0)) / (ssw / (Nf - kg))
    return pd.DataFrame({
        "event_type": r["t"].to_numpy(object),
        "n_i": r["n_i"].to_numpy(np.int64),
        "med2": r["med2"].to_numpy(np.int64),
        "s_i": r["s_i"].to_numpy(np.int64),
        "q_i": r["q_i"].to_numpy(np.int64),
        "w_stat": np.full(kg, w)})


def wilcoxon_shift(
    ds: ray.data.Dataset,
    key: str = "user_id",
    ts_col: str = "ts",
    num_partitions: int = 16,
) -> pd.DataFrame:
    """Wilcoxon signed-rank test of the corpus-wide activity shift
    between the first and second halves of the observation window:
    each key contributes the paired difference d = c₂ − c₁ of its
    event counts (zero differences drop, Wilcoxon convention), |d|
    ranks use average ties, and W⁺ = Σ_{d>0} rank(|d|) — the paired
    nonparametric complement to rising_keys' per-key drift scores
    (one corpus p-gate instead of a per-key ranking).

    Doubled rank sums keep everything EXACT int64 (2·avg_rank =
    2·cnt_less + t + 1 from the |d| histogram); the tie-corrected
    normal z is the only float closing, mirrored term-for-term.  One
    keyed exchange to per-key (c₁, c₂) cells; the histogram closing
    is |d|-domain-sized."""
    from .partition import group_apply

    # two-pass: global window bounds first (cheap aggregate), then
    # per-key half counts against the broadcast midpoint
    bounds = ds.select_columns([ts_col]).map_batches(
        lambda df: pd.DataFrame({
            "lo": [df[ts_col].to_numpy("datetime64[us]")
                   .view(np.int64).min()],
            "hi": [df[ts_col].to_numpy("datetime64[us]")
                   .view(np.int64).max()]}),
        batch_format="pandas").to_pandas()
    lo, hi = int(bounds["lo"].min()), int(bounds["hi"].max())
    mid = (lo + hi) // 2

    def half_counts(df: pd.DataFrame) -> pd.DataFrame:
        tus = df[ts_col].to_numpy("datetime64[us]").view(np.int64)
        second = tus > mid
        g = pd.DataFrame({key: df[key].to_numpy(),
                          "c1": (~second).astype(np.int64),
                          "c2": second.astype(np.int64)})
        return g.groupby(key, as_index=False, observed=True).sum()

    cells = group_apply(
        ds.select_columns([key, ts_col]).map_batches(
            half_counts, batch_format="pandas"),
        lambda df: df.groupby(key, as_index=False,
                              observed=True)[["c1", "c2"]].sum(),
        num_partitions=num_partitions, key=key,
    ).to_pandas()
    cols = {"m": pd.Series(dtype="int64"),
            "n_pos": pd.Series(dtype="int64"),
            "n_neg": pd.Series(dtype="int64"),
            "w2_pos": pd.Series(dtype="int64"),
            "z_score": pd.Series(dtype="float64")}
    if cells.empty:
        return pd.DataFrame(cols)
    d = cells["c2"].to_numpy(np.int64) - cells["c1"].to_numpy(np.int64)
    d = d[d != 0]
    m = len(d)
    if m == 0:
        return pd.DataFrame(cols)
    ad = np.abs(d)
    vals, cnts = np.unique(ad, return_counts=True)
    less = np.cumsum(cnts) - cnts
    avg2 = 2 * less + cnts + 1
    a2 = dict(zip(vals, avg2))
    r2 = np.array([a2[v] for v in ad], dtype=np.int64)
    w2p = int(r2[d > 0].sum())
    st = int((cnts.astype(np.int64) ** 3 - cnts).sum())
    mf = float(m)
    sigma2 = mf * (mf + 1.0) * (2.0 * mf + 1.0) / 24.0 \
        - float(st) / 48.0
    z = (float(w2p) - mf * (mf + 1.0) / 2.0) \
        / (2.0 * np.sqrt(sigma2)) if sigma2 > 0 else np.nan
    return pd.DataFrame({
        "m": [np.int64(m)], "n_pos": [np.int64(int((d > 0).sum()))],
        "n_neg": [np.int64(int((d < 0).sum()))],
        "w2_pos": [np.int64(w2p)], "z_score": [z]})


def trigram_entropy(
    ds: ray.data.Dataset,
    key: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    order_col: str = "event_id",
    num_partitions: int = 16,
) -> pd.DataFrame:
    """Corpus order-2 Markov (trigram) conditional entropy of the
    event-type process: H₂ = Σ (n_abc/N)·ln(n_ab·/n_abc) over all
    within-key trigrams, with perplexity exp(H₂) — how predictable
    the next event type is GIVEN THE LAST TWO (markov_entropy's
    order-1 rate can look random when the order-2 structure is
    nearly deterministic; compare the two to size the memory of the
    process).

    Trigram counts are exact int64 cells ((alphabet)³-bounded)
    through one key-hash exchange with vectorized shift matching;
    H₂ and perplexity close in mirrored float expressions."""
    from .partition import group_apply

    def cells(df: pd.DataFrame) -> pd.DataFrame:
        out = {"a": pd.Series(dtype=object),
               "b": pd.Series(dtype=object),
               "c": pd.Series(dtype=object),
               "cnt": pd.Series(dtype="int64")}
        if not len(df):
            return pd.DataFrame(out)
        kc, _ = pd.factorize(df[key])
        tus = df[ts_col].to_numpy("datetime64[us]").view(np.int64)
        oid = df[order_col].to_numpy(np.int64)
        perm = np.lexsort((oid, tus, kc))
        k = kc[perm]
        t = df[type_col].to_numpy(object)[perm]
        if len(t) < 3:
            return pd.DataFrame(out)
        same = k[1:] == k[:-1]
        ok = same[1:] & same[:-1]
        g = pd.DataFrame({"a": t[:-2][ok], "b": t[1:-1][ok],
                          "c": t[2:][ok]}).groupby(
            ["a", "b", "c"], as_index=False, observed=True).size()
        return g.rename(columns={"size": "cnt"})

    parts = group_apply(
        ds.select_columns([key, type_col, ts_col, order_col]),
        cells, num_partitions=num_partitions, key=key,
    ).to_pandas()
    cols = {"n_trigrams": pd.Series(dtype="int64"),
            "n_cells": pd.Series(dtype="int64"),
            "n_contexts": pd.Series(dtype="int64"),
            "h2": pd.Series(dtype="float64"),
            "perplexity": pd.Series(dtype="float64")}
    if parts.empty:
        return pd.DataFrame(cols)
    g = parts.groupby(["a", "b", "c"], as_index=False,
                      observed=True)["cnt"].sum()
    N = int(g["cnt"].sum())
    if N == 0:
        return pd.DataFrame(cols)
    ctx = g.groupby(["a", "b"])["cnt"].transform("sum") \
        .to_numpy(np.int64)
    nabc = g["cnt"].to_numpy(np.int64)
    Nf = float(N)
    h2 = float(np.sum(nabc.astype(np.float64) / Nf
                      * np.log(ctx.astype(np.float64)
                               / nabc.astype(np.float64))))
    return pd.DataFrame({
        "n_trigrams": [np.int64(N)],
        "n_cells": [np.int64(len(g))],
        "n_contexts": [np.int64(g.groupby(["a", "b"]).ngroups)],
        "h2": [h2], "perplexity": [float(np.exp(h2))]})


def median_test(
    ds: ray.data.Dataset,
    type_col: str = "event_type",
    val_col: str = "value",
) -> pd.DataFrame:
    """Mood's median test across categories: count each group's
    observations strictly above / not above the GRAND median and
    χ²-test the resulting k×2 contingency table — the coarsest but
    most outlier-proof k-group location gate (uses only the side of
    the median, so one wild value cannot move it), completing the
    location-test ladder anova_f (means) → kruskal_wallis (ranks) →
    median_test (signs).

    The grand median is exact in doubled k-space from the global
    value histogram (2·median integer); above/below counts are exact
    int64; χ² closes in the mirrored full-grid float sum.  Output:
    one row per group (n_above, n_below exact) with the shared χ²
    repeated."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        v = df[val_col].to_numpy(np.float64)
        ok = ~np.isnan(v)
        k = np.rint(v[ok] * 100.0).astype(np.int64)
        g = pd.DataFrame({"t": df[type_col].to_numpy(object)[ok],
                          "k": k}).groupby(
            ["t", "k"], as_index=False, observed=True).size()
        return g.rename(columns={"size": "c"})

    parts = ds.select_columns([type_col, val_col]).map_batches(
        partial, batch_format="pandas").to_pandas()
    cols = {"event_type": pd.Series(dtype=object),
            "n_above": pd.Series(dtype="int64"),
            "n_below": pd.Series(dtype="int64"),
            "med2": pd.Series(dtype="int64"),
            "chi2": pd.Series(dtype="float64")}
    if parts.empty:
        return pd.DataFrame(cols)
    cells = parts.groupby(["t", "k"], as_index=False,
                          observed=True)["c"].sum()
    gk = cells.groupby("k")["c"].sum().sort_index()
    ks = gk.index.to_numpy(np.int64)
    cc = gk.to_numpy(np.int64)
    n = int(cc.sum())
    if n < 2:
        return pd.DataFrame(cols)
    cum = np.cumsum(cc)
    lo = int(ks[np.searchsorted(cum, (n - 1) // 2 + 1)])
    hi = int(ks[np.searchsorted(cum, n // 2 + 1)])
    m2 = lo + hi                            # 2·grand median
    above = cells["k"].to_numpy(np.int64) * 2 > m2
    g = cells.assign(
        a=np.where(above, cells["c"], 0),
        b=np.where(above, 0, cells["c"])).groupby(
        "t", as_index=False)[["a", "b"]].sum()
    g = g.sort_values("t").reset_index(drop=True)
    a = g["a"].to_numpy(np.int64)
    b = g["b"].to_numpy(np.int64)
    ra = int(a.sum())
    rb = int(b.sum())
    if ra == 0 or rb == 0 or len(g) < 2:
        return pd.DataFrame(cols)
    nf = float(n)
    o = np.stack([a, b], axis=1).astype(np.float64)
    colt = np.array([float(ra), float(rb)])
    rowt = (a + b).astype(np.float64)
    e = rowt[:, None] * colt[None, :] / nf
    chi2 = float(np.sum((o - e) ** 2 / e))
    return pd.DataFrame({
        "event_type": g["t"].to_numpy(object),
        "n_above": a, "n_below": b,
        "med2": np.full(len(g), m2, dtype=np.int64),
        "chi2": np.full(len(g), chi2)})


def bartlett_test(
    ds: ray.data.Dataset,
    type_col: str = "event_type",
    val_col: str = "value",
) -> pd.DataFrame:
    """Bartlett's test of variance homogeneity across ALL categories
    of a bounded-alphabet column — the normal-theory member that
    completes the spread ladder (levene_bf = robust center-distance,
    median_test = location, bartlett = log-variance ratio):
    T = [(N−k)·ln(s_p²) − Σ(n_i−1)·ln(s_i²)] / C with
    C = 1 + (Σ1/(n_i−1) − 1/(N−k)) / (3(k−1)).

    Sufficient statistics are the same EXACT int64 per-group moments
    anova_f ships (n_i, Σx, Σx² in k-space); the sample variances
    s_i² = (q_i − s_i²/n_i)/(n_i−1), the pooled s_p² and T close in
    one mirrored float expression (ln on both sides).  Groups with
    n_i < 2 or zero variance drop on both sides.  Per-block moment
    partials; driver closing over |alphabet| cells."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        v = df[val_col].to_numpy(np.float64)
        ok = ~np.isnan(v)
        k = np.rint(v[ok] * 100.0).astype(np.int64)
        g = pd.DataFrame({"t": df[type_col].to_numpy(object)[ok],
                          "k": k, "k2": k * k}).groupby(
            "t", as_index=False, observed=True).agg(
            n=("k", "size"), s=("k", "sum"), q=("k2", "sum"))
        return g

    parts = ds.select_columns([type_col, val_col]).map_batches(
        partial, batch_format="pandas").to_pandas()
    cols = {"event_type": pd.Series(dtype=object),
            "n_i": pd.Series(dtype="int64"),
            "s_i": pd.Series(dtype="int64"),
            "q_i": pd.Series(dtype="int64"),
            "var_i": pd.Series(dtype="float64"),
            "bartlett_t": pd.Series(dtype="float64")}
    if parts.empty:
        return pd.DataFrame(cols)
    g = parts.groupby("t", as_index=False).agg(
        n_i=("n", "sum"), s_i=("s", "sum"), q_i=("q", "sum"))
    g = g[g["n_i"] >= 2].sort_values("t").reset_index(drop=True)
    ni = g["n_i"].to_numpy(np.int64)
    si = g["s_i"].to_numpy(np.int64)
    qi = g["q_i"].to_numpy(np.int64)
    nf = ni.astype(np.float64)
    with np.errstate(invalid="ignore", divide="ignore"):
        vi = (qi.astype(np.float64)
              - si.astype(np.float64) * si.astype(np.float64) / nf) \
            / (nf - 1.0)
    keep = vi > 0.0
    g, ni, nf, vi = g[keep], ni[keep], nf[keep], vi[keep]
    kg = len(g)
    N = int(ni.sum())
    if kg < 2 or N <= kg:
        return pd.DataFrame(cols)
    Nf, kf = float(N), float(kg)
    sp2 = float(np.sum((nf - 1.0) * vi)) / (Nf - kf)
    tnum = (Nf - kf) * np.log(sp2) \
        - float(np.sum((nf - 1.0) * np.log(vi)))
    corr = 1.0 + (float(np.sum(1.0 / (nf - 1.0)))
                  - 1.0 / (Nf - kf)) / (3.0 * (kf - 1.0))
    t = tnum / corr
    return pd.DataFrame({
        "event_type": g["t"].to_numpy(object),
        "n_i": ni,
        "s_i": g["s_i"].to_numpy(np.int64),
        "q_i": g["q_i"].to_numpy(np.int64),
        "var_i": vi,
        "bartlett_t": np.full(kg, t)})


def friedman_test(
    ds: ray.data.Dataset,
    key: str = "user_id",
    type_col: str = "event_type",
    num_partitions: int = 16,
) -> pd.DataFrame:
    """Friedman blocked rank test: does per-block activity differ
    across treatments when each block (key) is its own control?
    Blocks are keys, treatments the bounded event-type alphabet, the
    observation per (block, treatment) is the EVENT COUNT (0 for a
    type the key never fired — a valid count observation, so every
    block is complete).  Within-block doubled average ranks
    d2 = 2·#less + #eq + 1 are EXACT int64; per-type rank sums S_j,
    the per-block tie term Σ(t³−t) = Σ_cells(e²−1), block count n
    and alphabet size k travel as exact partials;
    χ² = 3·ΣS_j²/(n·k·(k+1)) − 3·n·(k+1), tie-corrected by
    1 − T/(n·(k³−k)), closes in one mirrored float expression.

    The k-group ladder's blocked member: anova_f/kruskal_wallis
    compare pooled value distributions, friedman removes per-key
    level differences first (a heavy user inflates every type
    equally and cancels).  One keyed exchange of (key, type) count
    cells; per-partition rank work is O(rows·k²) with k the bounded
    alphabet; driver reduction is k rows per partition."""
    from .partition import group_apply

    def cell_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby([key, type_col], as_index=False,
                       observed=True).size()
        return g.rename(columns={"size": "c"})

    cells_ds = ds.select_columns([key, type_col]).map_batches(
        cell_partial, batch_format="pandas")

    def type_partial(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({type_col: df[type_col].unique()})

    types = sorted(
        cells_ds.map_batches(type_partial, batch_format="pandas")
        .to_pandas()[type_col].unique().tolist())
    kg = len(types)
    t_index = {t: i for i, t in enumerate(types)}
    cols = {"event_type": pd.Series(dtype=object),
            "rank_sum_2x": pd.Series(dtype="int64"),
            "n_blocks": pd.Series(dtype="int64"),
            "n_types": pd.Series(dtype="int64"),
            "tie_term": pd.Series(dtype="int64"),
            "chi2_stat": pd.Series(dtype="float64"),
            "chi2_tie": pd.Series(dtype="float64")}
    if kg < 2:
        return pd.DataFrame(cols)

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        out = {"t": pd.Series(dtype=object),
               "s2x": pd.Series(dtype="int64"),
               "tie": pd.Series(dtype="int64"),
               "nu": pd.Series(dtype="int64")}
        if not len(df):
            return pd.DataFrame(out)
        g = df.groupby([key, type_col], as_index=False,
                       observed=True)["c"].sum()
        uc, uu = pd.factorize(g[key])
        tc = g[type_col].map(t_index).to_numpy(np.int64)
        M = np.zeros((len(uu), kg), np.int64)
        M[uc, tc] = g["c"].to_numpy(np.int64)
        less = (M[:, None, :] < M[:, :, None]).sum(axis=2)
        eq = (M[:, None, :] == M[:, :, None]).sum(axis=2)
        d2 = 2 * less + eq + 1
        s2x = d2.sum(axis=0).astype(np.int64)
        tie = int((eq * eq - 1).sum())
        tievec = np.zeros(kg, np.int64)
        nuvec = np.zeros(kg, np.int64)
        tievec[0] = tie                 # carried on types[0] only
        nuvec[0] = len(uu)
        return pd.DataFrame({"t": np.asarray(types, object),
                             "s2x": s2x, "tie": tievec,
                             "nu": nuvec})

    parts = group_apply(cells_ds, per_part,
                        num_partitions=num_partitions,
                        key=key).to_pandas()
    if parts.empty:
        return pd.DataFrame(cols)
    agg = parts.groupby("t", as_index=False).agg(
        s2x=("s2x", "sum"))
    agg = agg.sort_values("t").reset_index(drop=True)
    n = int(parts["nu"].sum())
    tie = int(parts["tie"].sum())
    if n < 2 or kg < 2 or tie >= n * (kg * kg * kg - kg):
        return pd.DataFrame(cols)
    s2x = agg["s2x"].to_numpy(np.int64)
    nf, kf = float(n), float(kg)
    ssq = float(np.sum(s2x.astype(np.float64)
                       * s2x.astype(np.float64)))
    chi2 = 3.0 * ssq / (nf * kf * (kf + 1.0)) \
        - 3.0 * nf * (kf + 1.0)
    c = 1.0 - float(tie) / (nf * (kf * kf * kf - kf))
    return pd.DataFrame({
        "event_type": agg["t"].to_numpy(object),
        "rank_sum_2x": s2x,
        "n_blocks": np.full(kg, n, dtype=np.int64),
        "n_types": np.full(kg, kg, dtype=np.int64),
        "tie_term": np.full(kg, tie, dtype=np.int64),
        "chi2_stat": np.full(kg, chi2),
        "chi2_tie": np.full(kg, chi2 / c)})


def jonckheere_terpstra(
    ds: ray.data.Dataset,
    type_col: str = "event_type",
    val_col: str = "value",
) -> pd.DataFrame:
    """Jonckheere–Terpstra ordered-alternative test: is there a
    monotone value trend ACROSS groups taken in their natural
    (lexicographic) order?  JT = Σ_{i<j} U_ij where U_ij counts
    pairs (x∈group_i) < (y∈group_j) plus half-ties — strictly more
    powerful than kruskal_wallis when the alternative is ordered.

    Doubled statistic 2·JT = Σ 2·lt + eq is EXACT int64 from the
    global value histogram (the rank_compare pair machinery summed
    over ordered pairs); the null mean E[2JT] = Σ_{i<j} n_i·n_j is
    exact int, and the tie-corrected null variance (Hollander–Wolfe
    6.19) closes in float from exact int ingredients
    T1 = N(N−1)(2N+5) − Σn(n−1)(2n+5) − Σt(t−1)(2t+5),
    A2·B2/(36N(N−1)(N−2)), A3·B3/(8N(N−1)) with A_* over group
    sizes and B_* over global value multiplicities (the A2·B2 and
    A3·B3 products are formed in float — each factor fits int64,
    the product may not).  z = (2JT − E[2JT])/(2√V).

    Per-block histogram partials; driver closing over bounded
    |alphabet|·|value domain| cells."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        v = df[val_col].to_numpy(np.float64)
        ok = ~np.isnan(v)
        k = np.rint(v[ok] * 100.0).astype(np.int64)
        g = pd.DataFrame({"t": df[type_col].to_numpy(object)[ok],
                          "k": k}).groupby(
            ["t", "k"], as_index=False, observed=True).size()
        return g.rename(columns={"size": "c"})

    parts = ds.select_columns([type_col, val_col]).map_batches(
        partial, batch_format="pandas").to_pandas()
    cols = {"event_type": pd.Series(dtype=object),
            "n_i": pd.Series(dtype="int64"),
            "n_total": pd.Series(dtype="int64"),
            "jt_twice": pd.Series(dtype="int64"),
            "jt_mean_twice": pd.Series(dtype="int64"),
            "z_score": pd.Series(dtype="float64")}
    if parts.empty:
        return pd.DataFrame(cols)
    cells = parts.groupby(["t", "k"], as_index=False,
                          observed=True)["c"].sum()
    types = np.sort(cells["t"].unique())
    kg = len(types)
    if kg < 2:
        return pd.DataFrame(cols)
    ks = np.sort(cells["k"].unique())
    G = np.zeros((len(ks), kg), np.int64)
    ti = pd.Series(np.arange(kg), index=types)
    ki = pd.Series(np.arange(len(ks)), index=ks)
    G[cells["k"].map(ki).to_numpy(np.int64),
      cells["t"].map(ti).to_numpy(np.int64)] = \
        cells["c"].to_numpy(np.int64)
    C = np.cumsum(G, axis=0) - G            # count strictly below
    P = np.cumsum(C, axis=1) - C            # Σ over earlier groups
    lt = int((G * P).sum())
    row = G.sum(axis=1)
    eq = int((row * row - (G * G).sum(axis=1)).sum()) // 2
    jt2 = 2 * lt + eq
    nj = G.sum(axis=0)
    N = int(nj.sum())
    cross = (N * N - int((nj * nj).sum())) // 2
    if N < 3:
        return pd.DataFrame(cols)
    a1 = int((nj * (nj - 1) * (2 * nj + 5)).sum())
    b1 = int((row * (row - 1) * (2 * row + 5)).sum())
    t1 = N * (N - 1) * (2 * N + 5) - a1 - b1
    a2 = int((nj * (nj - 1) * (nj - 2)).sum())
    b2 = int((row * (row - 1) * (row - 2)).sum())
    a3 = int((nj * (nj - 1)).sum())
    b3 = int((row * (row - 1)).sum())
    Nf = float(N)
    var = float(t1) / 72.0 \
        + float(a2) * float(b2) \
        / (36.0 * Nf * (Nf - 1.0) * (Nf - 2.0)) \
        + float(a3) * float(b3) / (8.0 * Nf * (Nf - 1.0))
    if var <= 0:
        return pd.DataFrame(cols)
    z = (float(jt2) - float(cross)) / (2.0 * np.sqrt(var))
    return pd.DataFrame({
        "event_type": types.astype(object),
        "n_i": nj,
        "n_total": np.full(kg, N, dtype=np.int64),
        "jt_twice": np.full(kg, jt2, dtype=np.int64),
        "jt_mean_twice": np.full(kg, cross, dtype=np.int64),
        "z_score": np.full(kg, z)})


def cochran_q(
    ds: ray.data.Dataset,
    key: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    window_us: int = 7 * 86400 * 10**6,
    num_partitions: int = 16,
) -> pd.DataFrame:
    """Cochran's Q test on binary per-block treatment indicators:
    did block (key) i fire treatment (type) j inside the trailing
    window [tmax − window, tmax]?  Completes the k-group ladder's
    binary member next to friedman_test (counts) — Q is Friedman
    restricted to 0/1 observations.

    All moments are EXACT int64: column totals G_j, N = ΣR_i and
    ΣR_i² from per-block row sums; blocks with R_i = 0 contribute
    nothing to either side, so only keys active in the window need
    materializing.  Q = (k−1)(k·ΣG_j² − N²)/(k·N − ΣR_i²) closes in
    one mirrored float expression.

    Scale shape: the window predicate is evaluated map-side against
    the broadcast tmax scalar, (key, type) pairs collapse to
    distinct cells per block before ONE keyed exchange, and the
    driver sees k + a-few-scalars partials per partition."""
    from .partition import group_apply

    tmax = int(pd.Timestamp(ds.max(ts_col)).value) // 1000
    lo = tmax - int(window_us)

    def cell_partial(df: pd.DataFrame) -> pd.DataFrame:
        tus = df[ts_col].to_numpy("datetime64[us]").astype(np.int64)
        m = tus >= lo
        g = df.loc[m, [key, type_col]].drop_duplicates()
        return g.reset_index(drop=True)

    cells = ds.select_columns([key, type_col, ts_col]).map_batches(
        cell_partial, batch_format="pandas")

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        out = {"t": pd.Series(dtype=object),
               "g": pd.Series(dtype="int64"),
               "r1": pd.Series(dtype="int64"),
               "r2": pd.Series(dtype="int64"),
               "nb": pd.Series(dtype="int64")}
        if not len(df):
            return pd.DataFrame(out)
        u = df[[key, type_col]].drop_duplicates()
        gj = u.groupby(type_col, as_index=False).size() \
            .rename(columns={"size": "g"})
        ri = u.groupby(key).size().to_numpy(np.int64)
        res = pd.DataFrame({"t": gj[type_col].to_numpy(object),
                            "g": gj["g"].to_numpy(np.int64)})
        res["r1"] = 0
        res["r2"] = 0
        res["nb"] = 0
        res.loc[0, "r1"] = int(ri.sum())
        res.loc[0, "r2"] = int((ri * ri).sum())
        res.loc[0, "nb"] = len(ri)
        return res

    parts = group_apply(cells, per_part,
                        num_partitions=num_partitions,
                        key=key).to_pandas()
    cols = {"event_type": pd.Series(dtype=object),
            "g_count": pd.Series(dtype="int64"),
            "n_blocks": pd.Series(dtype="int64"),
            "n_types": pd.Series(dtype="int64"),
            "n_total": pd.Series(dtype="int64"),
            "q_stat": pd.Series(dtype="float64")}
    if parts.empty:
        return pd.DataFrame(cols)
    agg = parts.groupby("t", as_index=False)["g"].sum() \
        .sort_values("t").reset_index(drop=True)
    kg = len(agg)
    n = int(parts["r1"].sum())
    r2 = int(parts["r2"].sum())
    nb = int(parts["nb"].sum())
    gg = int((agg["g"].to_numpy(np.int64)
              * agg["g"].to_numpy(np.int64)).sum())
    den = kg * n - r2
    if kg < 2 or den <= 0:
        return pd.DataFrame(cols)
    kf = float(kg)
    q = (kf - 1.0) * (kf * float(gg) - float(n) * float(n)) \
        / (kf * float(n) - float(r2))
    return pd.DataFrame({
        "event_type": agg["t"].to_numpy(object),
        "g_count": agg["g"].to_numpy(np.int64),
        "n_blocks": np.full(kg, nb, dtype=np.int64),
        "n_types": np.full(kg, kg, dtype=np.int64),
        "n_total": np.full(kg, n, dtype=np.int64),
        "q_stat": np.full(kg, q)})


def mcnemar_halves(
    ds: ray.data.Dataset,
    key: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    etype_a: str = "purchase",
    etype_b: str = "error",
    num_partitions: int = 16,
) -> pd.DataFrame:
    """McNemar paired-proportion test: per block (key), the binary
    outcome "fired MORE ``etype_a`` than ``etype_b`` events" in the
    FIRST vs SECOND half of the global time range (split at the
    integer-µs midpoint) — an exact-integer comparison per half, so
    the indicator itself needs no float.  The discordant counts
    b (first only) / c (second only) are exact; both χ² variants
    have INTEGER numerators — plain (b−c)² and Edwards-corrected
    (|b−c|−1)² — so each closes in one mirrored float division.

    Scale shape: tmin/tmax are two cheap metadata passes, the
    midpoint broadcasts as a plain int, per-key half-count cells
    sum-combine map-side then once per keyed exchange, and the
    driver sees a 2×2 table per partition."""
    from .partition import group_apply

    tmax = int(pd.Timestamp(ds.max(ts_col)).value) // 1000
    tmin = int(pd.Timestamp(ds.min(ts_col)).value) // 1000
    tmid = (tmin + tmax) // 2

    def cnt_partial(df: pd.DataFrame) -> pd.DataFrame:
        tus = df[ts_col].to_numpy("datetime64[us]").astype(np.int64)
        et = df[type_col].to_numpy(object)
        ha = et == etype_a
        hb = et == etype_b
        h1 = tus < tmid
        g = pd.DataFrame({
            key: df[key].to_numpy(np.int64),
            "a1": (ha & h1).astype(np.int64),
            "b1": (hb & h1).astype(np.int64),
            "a2": (ha & ~h1).astype(np.int64),
            "b2": (hb & ~h1).astype(np.int64)})
        return g.groupby(key, as_index=False).sum()

    cells = ds.select_columns([key, type_col, ts_col]).map_batches(
        cnt_partial, batch_format="pandas")

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({
                "a": pd.Series(dtype="int64"),
                "b": pd.Series(dtype="int64"),
                "c": pd.Series(dtype="int64"),
                "d": pd.Series(dtype="int64")})
        g = df.groupby(key, as_index=False)[
            ["a1", "b1", "a2", "b2"]].sum()
        x1 = (g["a1"].to_numpy(np.int64)
              > g["b1"].to_numpy(np.int64)).astype(np.int64)
        x2 = (g["a2"].to_numpy(np.int64)
              > g["b2"].to_numpy(np.int64)).astype(np.int64)
        return pd.DataFrame({
            "a": [int((x1 & x2).sum())],
            "b": [int((x1 & (1 - x2)).sum())],
            "c": [int(((1 - x1) & x2).sum())],
            "d": [int(((1 - x1) & (1 - x2)).sum())]})

    parts = group_apply(cells, per_part,
                        num_partitions=num_partitions,
                        key=key).to_pandas()
    cols = {"n_both": pd.Series(dtype="int64"),
            "n_first_only": pd.Series(dtype="int64"),
            "n_second_only": pd.Series(dtype="int64"),
            "n_neither": pd.Series(dtype="int64"),
            "chi2_plain": pd.Series(dtype="float64"),
            "chi2_corrected": pd.Series(dtype="float64")}
    if parts.empty:
        return pd.DataFrame(cols)
    a = int(parts["a"].sum())
    b = int(parts["b"].sum())
    c = int(parts["c"].sum())
    d = int(parts["d"].sum())
    if b + c == 0:
        return pd.DataFrame(cols)
    num_p = (b - c) * (b - c)
    num_c = (abs(b - c) - 1) * (abs(b - c) - 1)
    return pd.DataFrame({
        "n_both": np.array([a], np.int64),
        "n_first_only": np.array([b], np.int64),
        "n_second_only": np.array([c], np.int64),
        "n_neither": np.array([d], np.int64),
        "chi2_plain": [float(num_p) / float(b + c)],
        "chi2_corrected": [float(num_c) / float(b + c)]})


def sign_test_halves(
    ds: ray.data.Dataset,
    key: str = "user_id",
    ts_col: str = "ts",
    num_partitions: int = 16,
) -> pd.DataFrame:
    """Paired sign test on per-block activity: did each key fire
    MORE events in the second half of the global time range than
    the first (split at the integer-µs midpoint)?  Ties drop, the
    large-sample z closes from the exact plus/minus counts with
    continuity correction: z = (2·max(p,m) − n − 1)/√n, n = p+m.

    The nonparametric sibling of wilcoxon_shift (which ranks the
    magnitude of the change; the sign test uses direction only) —
    same scale shape: per-key (c1, c2) count cells sum-combine
    map-side then once per keyed exchange; three ints per partition
    reach the driver."""
    from .partition import group_apply

    tmax = int(pd.Timestamp(ds.max(ts_col)).value) // 1000
    tmin = int(pd.Timestamp(ds.min(ts_col)).value) // 1000
    tmid = (tmin + tmax) // 2

    def cnt_partial(df: pd.DataFrame) -> pd.DataFrame:
        tus = df[ts_col].to_numpy("datetime64[us]").astype(np.int64)
        g = pd.DataFrame({
            key: df[key].to_numpy(np.int64),
            "c1": (tus < tmid).astype(np.int64),
            "c2": (tus >= tmid).astype(np.int64)})
        return g.groupby(key, as_index=False).sum()

    cells = ds.select_columns([key, ts_col]).map_batches(
        cnt_partial, batch_format="pandas")

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({
                "p": pd.Series(dtype="int64"),
                "m": pd.Series(dtype="int64"),
                "t": pd.Series(dtype="int64")})
        g = df.groupby(key, as_index=False)[["c1", "c2"]].sum()
        c1 = g["c1"].to_numpy(np.int64)
        c2 = g["c2"].to_numpy(np.int64)
        return pd.DataFrame({
            "p": [int((c2 > c1).sum())],
            "m": [int((c1 > c2).sum())],
            "t": [int((c1 == c2).sum())]})

    parts = group_apply(cells, per_part,
                        num_partitions=num_partitions,
                        key=key).to_pandas()
    cols = {"n_plus": pd.Series(dtype="int64"),
            "n_minus": pd.Series(dtype="int64"),
            "n_ties": pd.Series(dtype="int64"),
            "z_stat": pd.Series(dtype="float64")}
    if parts.empty:
        return pd.DataFrame(cols)
    p = int(parts["p"].sum())
    m = int(parts["m"].sum())
    t = int(parts["t"].sum())
    n = p + m
    if n == 0:
        return pd.DataFrame(cols)
    z = (2.0 * float(max(p, m)) - float(n) - 1.0) \
        / float(np.sqrt(float(n)))
    return pd.DataFrame({
        "n_plus": np.array([p], np.int64),
        "n_minus": np.array([m], np.int64),
        "n_ties": np.array([t], np.int64),
        "z_stat": [z]})


def _two_sample_hist(
    ds: ray.data.Dataset,
    type_col: str,
    val_col: str,
    type_x: str,
    type_y: str,
) -> pd.DataFrame:
    """Shared map-side partial for the two-sample EDF/scale tests:
    exact (k = round(value·100), cx, cy) histogram cells for the two
    requested categories.  Cells are bounded by the value domain, so
    the driver-side closing never sees row-scale data."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        v = df[val_col].to_numpy(np.float64)
        t = df[type_col].to_numpy(object)
        ok = ~np.isnan(v) & ((t == type_x) | (t == type_y))
        k = np.rint(v[ok] * 100.0).astype(np.int64)
        isx = (t[ok] == type_x).astype(np.int64)
        g = pd.DataFrame({"k": k, "cx": isx, "cy": 1 - isx})
        return g.groupby("k", as_index=False).sum()

    parts = ds.select_columns([type_col, val_col]).map_batches(
        partial, batch_format="pandas").to_pandas()
    if parts.empty:
        return parts
    return parts.groupby("k", as_index=False)[["cx", "cy"]].sum() \
        .sort_values("k").reset_index(drop=True)


def cvm_two_sample(
    ds: ray.data.Dataset,
    type_col: str = "event_type",
    val_col: str = "value",
    type_x: str = "click",
    type_y: str = "view",
) -> pd.DataFrame:
    """Two-sample Cramér–von Mises statistic in its tie-robust
    EDF-functional form: T = NM/(N+M) · Σ_k (l_k/(N+M)) ·
    (F_N(k) − G_M(k))² with the pooled EDF as the integrator —
    equivalently T = Σ_k l_k·D_k² / ((N+M)²·N·M) with the EXACT
    integer cell deviations D_k = M·CX_k − N·CY_k.  The whole-
    distribution sibling of ks_drift (KS reads only the max EDF
    gap; CvM integrates every gap).

    Σ l·D² overflows int64 at ~10⁹ pooled rows, so the driver
    accumulates PYTHON ints over the (value-domain-bounded)
    histogram and the oracle mirrors in HUGEINT; the single closing
    division is the only float."""
    hist = _two_sample_hist(ds, type_col, val_col, type_x, type_y)
    cols = {"n_x": pd.Series(dtype="int64"),
            "n_y": pd.Series(dtype="int64"),
            "t_stat": pd.Series(dtype="float64")}
    if len(hist) == 0:
        return pd.DataFrame(cols)
    cx = [int(v) for v in hist["cx"]]
    cy = [int(v) for v in hist["cy"]]
    n, m = sum(cx), sum(cy)
    if n == 0 or m == 0:
        return pd.DataFrame(cols)
    num = 0
    CX = CY = 0
    for cxk, cyk in zip(cx, cy):
        CX += cxk
        CY += cyk
        d = m * CX - n * CY
        num += (cxk + cyk) * d * d
    den = (n + m) * (n + m) * n * m
    return pd.DataFrame({
        "n_x": np.array([n], np.int64),
        "n_y": np.array([m], np.int64),
        "t_stat": [float(num) / float(den)]})


def ansari_bradley(
    ds: ray.data.Dataset,
    type_col: str = "event_type",
    val_col: str = "value",
    type_x: str = "click",
    type_y: str = "view",
) -> pd.DataFrame:
    """Ansari–Bradley two-sample scale test with mid-rank ties:
    scores run 1, 2, … toward the middle from BOTH ends, so a
    sample squeezed toward the pooled median scores high.  Doubled
    mid-rank d2_k = 2·less_k + l_k + 1 and doubled score
    a2_k = min(d2_k, 2(N+1) − d2_k) are EXACT int64 from the pooled
    histogram; W2 = Σ cx_k·a2_k, S1 = Σ l_k·a2_k, S2 = Σ l_k·a2_k²
    are exact partial-friendly moments, and the tie-corrected
    normal closing z = (N·W2 − m·S1)/√(m·n·(N·S2 − S1²)/(N−1))
    is one mirrored float expression (N·S2 overflows int64 at
    ~10⁶ pooled rows → Python-int driver / HUGEINT oracle).

    Completes the scale ladder next to levene_bf/bartlett (moment
    tests) with a fully nonparametric member."""
    hist = _two_sample_hist(ds, type_col, val_col, type_x, type_y)
    cols = {"n_x": pd.Series(dtype="int64"),
            "n_y": pd.Series(dtype="int64"),
            "w_twice": pd.Series(dtype="int64"),
            "z_stat": pd.Series(dtype="float64")}
    if len(hist) == 0:
        return pd.DataFrame(cols)
    cx = [int(v) for v in hist["cx"]]
    cy = [int(v) for v in hist["cy"]]
    n_x, n_y = sum(cx), sum(cy)
    N = n_x + n_y
    if n_x == 0 or n_y == 0 or N < 2:
        return pd.DataFrame(cols)
    w2 = s1 = s2 = 0
    less = 0
    for cxk, cyk in zip(cx, cy):
        lk = cxk + cyk
        d2 = 2 * less + lk + 1
        a2 = min(d2, 2 * (N + 1) - d2)
        w2 += cxk * a2
        s1 += lk * a2
        s2 += lk * a2 * a2
        less += lk
    var_num = n_x * n_y * (N * s2 - s1 * s1)
    if var_num <= 0:
        return pd.DataFrame(cols)
    z = float(N * w2 - n_x * s1) \
        / float(np.sqrt(float(var_num) / float(N - 1)))
    return pd.DataFrame({
        "n_x": np.array([n_x], np.int64),
        "n_y": np.array([n_y], np.int64),
        "w_twice": np.array([w2], np.int64),
        "z_stat": [z]})


def mood_scale(
    ds: ray.data.Dataset,
    type_col: str = "event_type",
    val_col: str = "value",
    type_x: str = "click",
    type_y: str = "view",
) -> pd.DataFrame:
    """Mood two-sample squared-rank scale test: T = Σ_X
    (r_i − (N+1)/2)², mid-ranks for ties.  In doubled rank space
    e_k = d2_k − (N+1) is an exact int and T4 = 4T = Σ cx_k·e_k²;
    the moment closing z = (N·T4 − m·S1)/√(m·n·(N·S2 − S1²)/(N−1))
    uses S1 = Σ l·e², S2 = Σ l·e⁴ (e⁴ overflows int64 at ~10⁵
    pooled rows → Python-int driver / HUGEINT oracle).  The
    squared-deviation sibling of ansari_bradley (different score
    function, same machinery)."""
    hist = _two_sample_hist(ds, type_col, val_col, type_x, type_y)
    cols = {"n_x": pd.Series(dtype="int64"),
            "n_y": pd.Series(dtype="int64"),
            "t_quad": pd.Series(dtype="int64"),
            "z_stat": pd.Series(dtype="float64")}
    if len(hist) == 0:
        return pd.DataFrame(cols)
    cx = [int(v) for v in hist["cx"]]
    cy = [int(v) for v in hist["cy"]]
    n_x, n_y = sum(cx), sum(cy)
    N = n_x + n_y
    if n_x == 0 or n_y == 0 or N < 2:
        return pd.DataFrame(cols)
    t4 = s1 = s2 = 0
    less = 0
    for cxk, cyk in zip(cx, cy):
        lk = cxk + cyk
        e = 2 * less + lk + 1 - (N + 1)
        e2 = e * e
        t4 += cxk * e2
        s1 += lk * e2
        s2 += lk * e2 * e2
        less += lk
    var_num = n_x * n_y * (N * s2 - s1 * s1)
    if var_num <= 0:
        return pd.DataFrame(cols)
    z = float(N * t4 - n_x * s1) \
        / float(np.sqrt(float(var_num) / float(N - 1)))
    return pd.DataFrame({
        "n_x": np.array([n_x], np.int64),
        "n_y": np.array([n_y], np.int64),
        "t_quad": np.array([t4], np.int64),
        "z_stat": [z]})


def brunner_munzel(
    ds: ray.data.Dataset,
    type_col: str = "event_type",
    val_col: str = "value",
    type_x: str = "click",
    type_y: str = "view",
) -> pd.DataFrame:
    """Brunner–Munzel heteroscedastic rank test (the "generalized
    Wilcoxon"): tests P(X<Y) + ½P(X=Y) = ½ WITHOUT assuming equal
    variances or shapes — the rank ladder's Welch analogue, next to
    cvm/ansari/mood which all assume exchangeability under H0.

    Everything reduces over the shared exact (k, cx, cy) value
    histogram: doubled placements p2x_k = 2·cy_less + cy_k (x among
    y) and p2y_k = 2·cx_less + cx_k are exact ints; the placement
    variance moments VX = Σ cx·(n·p2x − Px)², VY likewise, and the
    doubled mean-rank gap num2 = n·Σcy·r2 − m·Σcx·r2 overflow int64
    at ~10⁵ pooled rows → Python-int driver / HUGEINT oracle.
    Closings (p̂ = Py/2nm and W = num2 / (N·√(VX/(n²(n−1)) +
    VY/(m²(m−1)))·... standard scipy form) are the mirrored float
    expressions."""
    hist = _two_sample_hist(ds, type_col, val_col, type_x, type_y)
    cols = {"n_x": pd.Series(dtype="int64"),
            "n_y": pd.Series(dtype="int64"),
            "p_hat": pd.Series(dtype="float64"),
            "w_stat": pd.Series(dtype="float64")}
    if len(hist) == 0:
        return pd.DataFrame(cols)
    cx = [int(v) for v in hist["cx"]]
    cy = [int(v) for v in hist["cy"]]
    n, m = sum(cx), sum(cy)
    N = n + m
    if n < 2 or m < 2:
        return pd.DataFrame(cols)
    cxlt = cylt = 0
    px = py = 0          # Σ cx·p2x, Σ cy·p2y (doubled placements)
    sx_r = sy_r = 0      # Σ cx·r2, Σ cy·r2 (doubled pooled ranks)
    cells = []
    for cxk, cyk in zip(cx, cy):
        r2 = 2 * (cxlt + cylt) + (cxk + cyk) + 1
        p2x = 2 * cylt + cyk
        p2y = 2 * cxlt + cxk
        px += cxk * p2x
        py += cyk * p2y
        sx_r += cxk * r2
        sy_r += cyk * r2
        cells.append((cxk, cyk, p2x, p2y))
        cxlt += cxk
        cylt += cyk
    vx = vy = 0
    for cxk, cyk, p2x, p2y in cells:
        dx = n * p2x - px
        dy = m * p2y - py
        vx += cxk * dx * dx
        vy += cyk * dy * dy
    num2 = n * sy_r - m * sx_r
    if vx == 0 and vy == 0:
        return pd.DataFrame(cols)
    p_hat = float(py) / float(2 * n * m)
    # scipy form: W = nm(R̄y−R̄x)/((n+m)·sqrt(n·Sx + m·Sy)) with
    # Sx = VX/(4n²(n−1)); nm(R̄y−R̄x) = num2/2 ⇒ the 2s cancel:
    w = float(num2) / (float(N) * np.sqrt(
        float(vx) / float(n * (n - 1))
        + float(vy) / float(m * (m - 1))))
    return pd.DataFrame({
        "n_x": np.array([n], np.int64),
        "n_y": np.array([m], np.int64),
        "p_hat": [p_hat],
        "w_stat": [w]})


def cucconi_test(
    ds: ray.data.Dataset,
    type_col: str = "event_type",
    val_col: str = "value",
    type_x: str = "click",
    type_y: str = "view",
) -> pd.DataFrame:
    """Cucconi two-sample location–scale test: combines the squared
    ranks from BOTH ends (U on R², V on (N+1−R)²) with their exact
    negative correlation ρ into one elliptic statistic
    C = (U² + V² − 2ρUV)/(2(1−ρ²)) — older than and competitive
    with Lepage, and the only member of the ladder that reads
    location AND scale shifts in a single number.

    Mid-rank ties via the doubled-rank histogram: S1 = Σ cy·r2,
    S2 = Σ cy·r2² are exact (Python-int / HUGEINT; r2² overflows
    int64 at ~10⁵ pooled rows).  With ΣR² = S2/4 and
    Σ(N+1−R)² = S2/4 − (N+1)·S1/2 + m(N+1)², the doubled numerators
    nuU = 3·S2 − 2m(N+1)(2N+1) and
    nuV = 3·S2 − 12(N+1)·S1 + 12m(N+1)² − 2m(N+1)(2N+1) are exact
    ints; U = nuU/(2√D), V = nuV/(2√D) with
    D = mn(N+1)(2N+1)(8N+11)/5 and
    ρ = 2(N²−4)/((2N+1)(8N+11)) − 1 close as mirrored floats."""
    hist = _two_sample_hist(ds, type_col, val_col, type_x, type_y)
    cols = {"n_x": pd.Series(dtype="int64"),
            "n_y": pd.Series(dtype="int64"),
            "u_stat": pd.Series(dtype="float64"),
            "v_stat": pd.Series(dtype="float64"),
            "c_stat": pd.Series(dtype="float64")}
    if len(hist) == 0:
        return pd.DataFrame(cols)
    cx = [int(v) for v in hist["cx"]]
    cy = [int(v) for v in hist["cy"]]
    n, m = sum(cx), sum(cy)
    N = n + m
    if n == 0 or m == 0 or N < 3:
        return pd.DataFrame(cols)
    less = 0
    s1 = s2 = 0
    for cxk, cyk in zip(cx, cy):
        lk = cxk + cyk
        r2 = 2 * less + lk + 1
        s1 += cyk * r2
        s2 += cyk * r2 * r2
        less += lk
    nu_u = 3 * s2 - 2 * m * (N + 1) * (2 * N + 1)
    nu_v = (3 * s2 - 12 * (N + 1) * s1 + 12 * m * (N + 1) * (N + 1)
            - 2 * m * (N + 1) * (2 * N + 1))
    den = 2.0 * np.sqrt(
        float(m) * float(n) * float(N + 1) * float(2 * N + 1)
        * float(8 * N + 11) / 5.0)
    u = float(nu_u) / den
    v = float(nu_v) / den
    rho = 2.0 * float(N * N - 4) \
        / (float(2 * N + 1) * float(8 * N + 11)) - 1.0
    c = (u * u + v * v - 2.0 * rho * u * v) \
        / (2.0 * (1.0 - rho * rho))
    return pd.DataFrame({
        "n_x": np.array([n], np.int64),
        "n_y": np.array([m], np.int64),
        "u_stat": [u], "v_stat": [v], "c_stat": [c]})


def dagostino_k2(
    ds: ray.data.Dataset,
    group_col: str = "event_type",
    val_col: str = "value",
) -> pd.DataFrame:
    """D'Agostino–Pearson K² omnibus normality test per group: the
    skewness z (D'Agostino 1970 transform) and kurtosis z
    (Anscombe–Glynn 1983) combined as K² = z₁² + z₂² ~ χ²(2) —
    the distribution-shape gate that jarque_bera approximates with
    raw moments and this finishes with the finite-n transforms
    scipy.stats.normaltest uses.

    Map-side partials are exact power sums S1..S4 over quantized
    k-space (k⁴ overflows int64 at ~10⁴ rows → Python-int driver /
    HUGEINT oracle); every downstream quantity (central moments,
    g1, b2, the ln/sqrt/cbrt ladder of both transforms) is a
    deterministic float expression mirrored verbatim in the SQL
    twin.  One bounded-alphabet reduce, no exchange."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        v = df[val_col].to_numpy(np.float64)
        g = df[group_col].to_numpy(object)
        ok = ~np.isnan(v)
        k = np.rint(v[ok] * 100.0).astype(np.int64)
        d = pd.DataFrame({group_col: g[ok], "n": 1, "s1": k,
                          "s2": k * k})
        # k³/k⁴ overflow int64 in bulk — object (Python int) sums
        d["s3"] = [int(x) ** 3 for x in k]
        d["s4"] = [int(x) ** 4 for x in k]
        return d.groupby(group_col, as_index=False).agg(
            n=("n", "sum"), s1=("s1", "sum"), s2=("s2", "sum"),
            s3=("s3", "sum"), s4=("s4", "sum"))

    parts = ds.select_columns([group_col, val_col]).map_batches(
        partial, batch_format="pandas").to_pandas()
    cols = {group_col: pd.Series(dtype=object),
            "n": pd.Series(dtype="int64"),
            "skew_g1": pd.Series(dtype="float64"),
            "kurt_b2": pd.Series(dtype="float64"),
            "z_skew": pd.Series(dtype="float64"),
            "z_kurt": pd.Series(dtype="float64"),
            "k2_stat": pd.Series(dtype="float64")}
    if parts.empty:
        return pd.DataFrame(cols)
    rows = []
    for gname, g in parts.groupby(group_col):
        n = int(g["n"].sum())
        if n < 20:        # Anscombe–Glynn needs n ≥ 20
            continue
        s1 = int(g["s1"].sum())
        s2 = int(g["s2"].sum())
        s3 = sum(int(x) for x in g["s3"])
        s4 = sum(int(x) for x in g["s4"])
        nf = float(n)
        m1 = float(s1) / nf
        m2 = float(s2) / nf - m1 * m1
        m3 = float(s3) / nf - 3.0 * m1 * (float(s2) / nf) \
            + 2.0 * m1 * m1 * m1
        m4 = float(s4) / nf - 4.0 * m1 * (float(s3) / nf) \
            + 6.0 * m1 * m1 * (float(s2) / nf) \
            - 3.0 * m1 * m1 * m1 * m1
        if m2 <= 0.0:
            continue
        g1 = m3 / (m2 * np.sqrt(m2))
        b2 = m4 / (m2 * m2)
        # D'Agostino (1970) skewness transform
        y = g1 * np.sqrt((nf + 1.0) * (nf + 3.0)
                         / (6.0 * (nf - 2.0)))
        beta2 = (3.0 * (nf * nf + 27.0 * nf - 70.0)
                 * (nf + 1.0) * (nf + 3.0)
                 / ((nf - 2.0) * (nf + 5.0) * (nf + 7.0)
                    * (nf + 9.0)))
        w2 = -1.0 + np.sqrt(2.0 * (beta2 - 1.0))
        delta = 1.0 / np.sqrt(0.5 * np.log(w2))
        alpha = np.sqrt(2.0 / (w2 - 1.0))
        ya = y / alpha
        z1 = delta * np.log(ya + np.sqrt(ya * ya + 1.0))
        # Anscombe–Glynn (1983) kurtosis transform
        eb2 = 3.0 * (nf - 1.0) / (nf + 1.0)
        vb2 = (24.0 * nf * (nf - 2.0) * (nf - 3.0)
               / ((nf + 1.0) * (nf + 1.0) * (nf + 3.0)
                  * (nf + 5.0)))
        xk = (b2 - eb2) / np.sqrt(vb2)
        sqb1 = (6.0 * (nf * nf - 5.0 * nf + 2.0)
                / ((nf + 7.0) * (nf + 9.0))
                * np.sqrt(6.0 * (nf + 3.0) * (nf + 5.0)
                          / (nf * (nf - 2.0) * (nf - 3.0))))
        aa = 6.0 + 8.0 / sqb1 * (2.0 / sqb1
                                 + np.sqrt(1.0 + 4.0
                                           / (sqb1 * sqb1)))
        z2 = ((1.0 - 2.0 / (9.0 * aa))
              - np.cbrt((1.0 - 2.0 / aa)
                        / (1.0 + xk * np.sqrt(2.0 / (aa - 4.0))))
              ) * np.sqrt(4.5 * aa)
        rows.append((gname, np.int64(n), float(g1), float(b2),
                     float(z1), float(z2),
                     float(z1 * z1 + z2 * z2)))
    if not rows:
        return pd.DataFrame(cols)
    return pd.DataFrame(rows, columns=list(cols)) \
        .sort_values(group_col).reset_index(drop=True)


def cox_stuart(
    ds: ray.data.Dataset,
    key: str = "user_id",
    ts_col: str = "ts",
    val_col: str = "value",
    order_col: str = "event_id",
    num_partitions: int = 16,
) -> pd.DataFrame:
    """Cox–Stuart trend test per key: pair each of the first
    ⌊n/2⌋ points with the point c = n − ⌊n/2⌋ positions later
    (the middle point drops out when n is odd) and sign-test the
    pairs — the O(n) trend screen next to mann_kendall's O(n²)
    statistic and theilsen's O(n²) slope.  Exact integer
    plus/minus/tie counts in quantized k-space; ties drop per
    Cox–Stuart; the one closing is the continuity-corrected
    z = (2·n_plus − mtot)/√mtot over mtot = n_plus + n_minus."""
    from .partition import group_apply

    def per_key(df: pd.DataFrame) -> pd.DataFrame:
        cols = {key: pd.Series(dtype="int64"),
                "n": pd.Series(dtype="int64"),
                "n_plus": pd.Series(dtype="int64"),
                "n_minus": pd.Series(dtype="int64"),
                "z_stat": pd.Series(dtype="float64")}
        if not len(df):
            return pd.DataFrame(cols)
        s = df.sort_values([key, ts_col, order_col],
                           kind="mergesort")
        kc, kuniq = pd.factorize(s[key])
        x = np.rint(s[val_col].to_numpy(np.float64) * 100.0) \
            .astype(np.int64)
        order = np.argsort(kc, kind="stable")
        k, xs = kc[order], x[order]
        starts = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
        n = np.diff(np.r_[starts, len(k)]).astype(np.int64)
        rows = []
        for i, st in enumerate(starts):
            ni = int(n[i])
            half = ni // 2
            if half == 0:
                continue
            c = ni - half
            a = xs[st:st + half]
            b = xs[st + c:st + c + half]
            plus = int((b > a).sum())
            minus = int((b < a).sum())
            mtot = plus + minus
            if mtot == 0:
                continue
            z = float(2 * plus - mtot) / float(np.sqrt(float(mtot)))
            rows.append((int(np.asarray(kuniq)[k[st]]),
                         np.int64(ni), np.int64(plus),
                         np.int64(minus), z))
        if not rows:
            return pd.DataFrame(cols)
        return pd.DataFrame(rows, columns=list(cols))

    out = group_apply(
        ds.select_columns([key, ts_col, val_col, order_col]),
        per_key, num_partitions=num_partitions, key=key,
    ).to_pandas()
    if out.empty:
        return pd.DataFrame({key: pd.Series(dtype="int64"),
                             "n": pd.Series(dtype="int64"),
                             "n_plus": pd.Series(dtype="int64"),
                             "n_minus": pd.Series(dtype="int64"),
                             "z_stat": pd.Series(dtype="float64")})
    return out.sort_values(key).reset_index(drop=True)


def hodges_lehmann(
    ds: ray.data.Dataset,
    type_col: str = "event_type",
    val_col: str = "value",
    type_x: str = "click",
    type_y: str = "view",
) -> pd.DataFrame:
    """Hodges–Lehmann shift estimator between two samples: the
    median of ALL n·m pairwise differences y_j − x_i — the robust
    location-shift companion to the rank tests (wilcoxon_shift
    reads a rank statistic; this returns the shift in value
    units, 29 % efficiency cost vs the mean at the normal and
    unbounded breakdown wins everywhere else).

    O(n·m) pairs never materialize: both samples reduce to exact
    deci-quantized histograms (k = round(value·10) — coarser than
    the centi grid so the SQL twin's cell cross-join stays ≤10⁶
    rows), the difference distribution is their exact integer
    convolution, and the median is two order statistics on the
    cumulative counts (doubled hl2 = lo + hi handles even n·m
    without a float).  hl_shift = hl2/20 is the one closing."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        v = df[val_col].to_numpy(np.float64)
        t = df[type_col].to_numpy(object)
        ok = ~np.isnan(v) & ((t == type_x) | (t == type_y))
        k = np.rint(v[ok] * 10.0).astype(np.int64)
        isx = (t[ok] == type_x).astype(np.int64)
        g = pd.DataFrame({"k": k, "cx": isx, "cy": 1 - isx})
        return g.groupby("k", as_index=False).sum()

    hist = ds.select_columns([type_col, val_col]).map_batches(
        partial, batch_format="pandas").to_pandas()
    cols = {"n_x": pd.Series(dtype="int64"),
            "n_y": pd.Series(dtype="int64"),
            "hl2": pd.Series(dtype="int64"),
            "hl_shift": pd.Series(dtype="float64")}
    if hist.empty:
        return pd.DataFrame(cols)
    hist = hist.groupby("k", as_index=False)[["cx", "cy"]].sum()
    n, m = int(hist["cx"].sum()), int(hist["cy"].sum())
    if n == 0 or m == 0:
        return pd.DataFrame(cols)
    kmin, kmax = int(hist["k"].min()), int(hist["k"].max())
    width = kmax - kmin + 1
    dx = np.zeros(width, np.int64)
    dy = np.zeros(width, np.int64)
    idx = hist["k"].to_numpy(np.int64) - kmin
    dx[idx] = hist["cx"].to_numpy(np.int64)
    dy[idx] = hist["cy"].to_numpy(np.int64)
    # conv[j] = Σ_i dy[i]·dx[i−j+width−1]: diff d = ky − kx runs
    # −(width−1) .. width−1 at conv index d + width − 1
    conv = np.convolve(dy, dx[::-1])
    cum = np.cumsum(conv)
    P = n * m
    lo_i = int(np.searchsorted(cum, (P + 1) // 2))
    hi_i = int(np.searchsorted(cum, P // 2 + 1))
    lo = lo_i - (width - 1)
    hi = hi_i - (width - 1)
    hl2 = lo + hi
    return pd.DataFrame({
        "n_x": np.array([n], np.int64),
        "n_y": np.array([m], np.int64),
        "hl2": np.array([hl2], np.int64),
        "hl_shift": [float(hl2) / 20.0]})


def page_trend(
    ds: ray.data.Dataset,
    key: str = "user_id",
    ts_col: str = "ts",
    num_quarters: int = 4,
) -> pd.DataFrame:
    """Page's L trend test for ordered alternatives: blocks are
    keys, treatments the ``num_quarters`` ORDERED quarters of the
    global time range, the observation per (block, quarter) the
    key's event count (0 for a silent quarter — every block is
    complete).  Where friedman asks "do the quarters differ at
    all", Page's L = Σ_j j·R_j asks specifically "do they
    monotonically increase" — the blocked cousin of
    jonckheere's pooled ordered test.

    Quarter assignment is the exact integer
    min(k−1, (ts−t0)·k // (t1−t0+1)); within-block doubled
    midranks d2 and L2 = Σ j·d2 are exact int64; the one closing
    is the normal z = (L2 − b·k(k+1)²/2) /
    (2·√(b·k²(k+1)(k²−1)/144)) (midrank ties make σ an
    approximation — documented; counts and L2 stay exact)."""
    k = int(num_quarters)
    t0 = int(pd.Timestamp(ds.min(ts_col)).value) // 1000
    t1 = int(pd.Timestamp(ds.max(ts_col)).value) // 1000
    span = t1 - t0 + 1

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        tus = df[ts_col].to_numpy("datetime64[us]").view(np.int64)
        qt = np.minimum(k - 1, (tus - t0) * k // span)
        g = pd.DataFrame({key: df[key].to_numpy(), "qt": qt})
        c = g.groupby([key, "qt"], as_index=False).size()
        return c.rename(columns={"size": "c"})

    cells = ds.select_columns([key, ts_col]).map_batches(
        partial, batch_format="pandas").to_pandas()
    cols = {"n_blocks": pd.Series(dtype="int64"),
            "n_quarters": pd.Series(dtype="int64"),
            "l2": pd.Series(dtype="int64"),
            "z_stat": pd.Series(dtype="float64")}
    if cells.empty:
        return pd.DataFrame(cols)
    cells = cells.groupby([key, "qt"], as_index=False)["c"].sum()
    uc, uu = pd.factorize(cells[key])
    M = np.zeros((len(uu), k), np.int64)
    M[uc, cells["qt"].to_numpy(np.int64)] = \
        cells["c"].to_numpy(np.int64)
    b = len(uu)
    less = (M[:, None, :] < M[:, :, None]).sum(axis=2)
    eq = (M[:, None, :] == M[:, :, None]).sum(axis=2)
    d2 = 2 * less + eq + 1
    l2 = int((d2 * (np.arange(k, dtype=np.int64) + 1)).sum())
    mu2 = b * k * (k + 1) * (k + 1) // 2
    var = float(b) * float(k * k) * float(k + 1) \
        * float(k * k - 1) / 144.0
    z = float(l2 - mu2) / (2.0 * np.sqrt(var))
    return pd.DataFrame({
        "n_blocks": np.array([b], np.int64),
        "n_quarters": np.array([k], np.int64),
        "l2": np.array([l2], np.int64),
        "z_stat": [z]})


def hbos_anomalies(
    ds: ray.data.Dataset,
    ts_col: str = "ts",
    val_col: str = "value",
    order_col: str = "event_id",
    top: int = 20,
) -> pd.DataFrame:
    """HBOS (histogram-based outlier score, Goldstein–Dengel 2012)
    over two bounded feature histograms — the value's 500-centi-k
    bin and the hour of day: score = −ln(p_bin) − ln(p_hour),
    assuming feature independence.  The density-based member of
    the anomaly ladder next to zscore_anomalies (parametric) and
    robust_anomalies (order-statistic).

    Rank order NEVER touches a float: score is monotone decreasing
    in the exact integer product c_bin·c_hour, so the top-``top``
    selection orders by (c_bin·c_hour ASC, id) — bit-stable across
    engines; hbos_score = (ln n − ln c_bin) + (ln n − ln c_hour)
    is a mirrored display closing.  Two bounded-cell count partials
    (21 + 24 cells), one broadcast, per-batch partial top-k."""
    import ray as _ray

    def feat(df: pd.DataFrame) -> pd.DataFrame:
        k = np.rint(df[val_col].to_numpy(np.float64) * 100.0) \
            .astype(np.int64)
        vb = np.minimum(np.maximum(k + 5000, 0) // 500, 20)
        tus = df[ts_col].to_numpy("datetime64[us]").view(np.int64)
        hr = (tus // 3_600_000_000) % 24
        return pd.DataFrame({order_col: df[order_col].to_numpy(),
                             "vbin": vb, "hour": hr})

    feats = ds.select_columns([order_col, ts_col, val_col]) \
        .map_batches(feat, batch_format="pandas")

    def cell_partial(df: pd.DataFrame) -> pd.DataFrame:
        a = df.groupby("vbin", as_index=False).size() \
            .rename(columns={"vbin": "cell", "size": "c"})
        a["dim"] = 0
        b = df.groupby("hour", as_index=False).size() \
            .rename(columns={"hour": "cell", "size": "c"})
        b["dim"] = 1
        return pd.concat([a, b], ignore_index=True)

    cells = feats.map_batches(cell_partial, batch_format="pandas") \
        .to_pandas().groupby(["dim", "cell"], as_index=False)["c"] \
        .sum()
    cols = {order_col: pd.Series(dtype="int64"),
            "vbin": pd.Series(dtype="int64"),
            "hour": pd.Series(dtype="int64"),
            "c_vbin": pd.Series(dtype="int64"),
            "c_hour": pd.Series(dtype="int64"),
            "hbos_score": pd.Series(dtype="float64")}
    if cells.empty:
        return pd.DataFrame(cols)
    n = int(cells.loc[cells["dim"] == 0, "c"].sum())
    cv = dict(zip(cells.loc[cells["dim"] == 0, "cell"],
                  cells.loc[cells["dim"] == 0, "c"]))
    ch = dict(zip(cells.loc[cells["dim"] == 1, "cell"],
                  cells.loc[cells["dim"] == 1, "c"]))
    ref = _ray.put((n, cv, ch))

    def score_topk(df: pd.DataFrame) -> pd.DataFrame:
        nn, cvd, chd = _ray.get(ref)
        a = df["vbin"].map(cvd).to_numpy(np.int64)
        b = df["hour"].map(chd).to_numpy(np.int64)
        d = pd.DataFrame({order_col: df[order_col].to_numpy(),
                          "vbin": df["vbin"].to_numpy(np.int64),
                          "hour": df["hour"].to_numpy(np.int64),
                          "c_vbin": a, "c_hour": b,
                          "prod": a * b})
        return d.sort_values(["prod", order_col],
                             kind="mergesort").head(top)

    cand = feats.map_batches(score_topk, batch_format="pandas") \
        .to_pandas().sort_values(["prod", order_col],
                                 kind="mergesort").head(top)
    nf = float(n)
    sc = (np.log(nf)
          - np.log(cand["c_vbin"].to_numpy(np.float64))) \
        + (np.log(nf)
           - np.log(cand["c_hour"].to_numpy(np.float64)))
    out = cand.drop(columns=["prod"]).reset_index(drop=True)
    out["hbos_score"] = sc
    return out


def kuiper_test(
    ds: ray.data.Dataset,
    type_col: str = "event_type",
    val_col: str = "value",
    type_x: str = "click",
    type_y: str = "view",
) -> pd.DataFrame:
    """Kuiper two-sample test: V = D⁺ + D⁻ = max(F−G) + max(G−F)
    over the pooled value grid — the rotation-invariant sibling of
    ks_drift (KS reads one max and is blind to equal-and-opposite
    tail deviations; Kuiper weighs both directions equally and is
    the right EDF test for circular/wrapped quantities).

    Exact integer cell deviations d_k = m·CX_k − n·CY_k give
    D⁺ = max(d)/nm and D⁻ = max(−d)/nm; the deviations travel with
    the shared value histogram and the two closings are the only
    floats."""
    hist = _two_sample_hist(ds, type_col, val_col, type_x, type_y)
    cols = {"n_x": pd.Series(dtype="int64"),
            "n_y": pd.Series(dtype="int64"),
            "d_plus": pd.Series(dtype="float64"),
            "d_minus": pd.Series(dtype="float64"),
            "v_stat": pd.Series(dtype="float64")}
    if len(hist) == 0:
        return pd.DataFrame(cols)
    cx = hist["cx"].to_numpy(np.int64)
    cy = hist["cy"].to_numpy(np.int64)
    n, m = int(cx.sum()), int(cy.sum())
    if n == 0 or m == 0:
        return pd.DataFrame(cols)
    d = m * np.cumsum(cx) - n * np.cumsum(cy)
    # include the empty prefix (deviation 0) like the EDF does
    dp = max(0, int(d.max()))
    dm = max(0, int(-d.min()))
    nm = float(n) * float(m)
    return pd.DataFrame({
        "n_x": np.array([n], np.int64),
        "n_y": np.array([m], np.int64),
        "d_plus": [float(dp) / nm],
        "d_minus": [float(dm) / nm],
        "v_stat": [float(dp + dm) / nm]})


def wasserstein1(
    ds: ray.data.Dataset,
    type_col: str = "event_type",
    val_col: str = "value",
    type_x: str = "click",
    type_y: str = "view",
) -> pd.DataFrame:
    """1-D Wasserstein-1 (earth mover's) distance between the two
    samples' value distributions: W₁ = ∫|F_n − G_m| dx over the
    pooled grid — the AREA between the EDFs, where ks/kuiper read
    only extreme gaps and cvm squares them.  The natural "how far
    apart in value units" drift number.

    Exact: with cell gaps Δk to the next occupied cell,
    num = Σ_k Δk·|m·CX_k − n·CY_k| is an exact Python int
    (HUGEINT oracle), and W₁ = num/(n·m·100) — descaled back to
    value units — is the single closing."""
    hist = _two_sample_hist(ds, type_col, val_col, type_x, type_y)
    cols = {"n_x": pd.Series(dtype="int64"),
            "n_y": pd.Series(dtype="int64"),
            "w1_dist": pd.Series(dtype="float64")}
    if len(hist) == 0:
        return pd.DataFrame(cols)
    k = hist["k"].to_numpy(np.int64)
    cx = hist["cx"].to_numpy(np.int64)
    cy = hist["cy"].to_numpy(np.int64)
    n, m = int(cx.sum()), int(cy.sum())
    if n == 0 or m == 0 or len(k) < 2:
        return pd.DataFrame(cols)
    d = m * np.cumsum(cx) - n * np.cumsum(cy)
    gaps = np.diff(k)
    num = sum(int(g) * abs(int(dd))
              for g, dd in zip(gaps, d[:-1]))
    w1 = float(num) / (float(n) * float(m) * 100.0)
    return pd.DataFrame({
        "n_x": np.array([n], np.int64),
        "n_y": np.array([m], np.int64),
        "w1_dist": [w1]})


def energy_distance(
    ds: ray.data.Dataset,
    type_col: str = "event_type",
    val_col: str = "value",
    type_x: str = "click",
    type_y: str = "view",
) -> pd.DataFrame:
    """Székely–Rizzo energy distance between the two value
    distributions: D² = 2·E|X−Y| − E|X−X'| − E|Y−Y'| — zero iff
    the distributions are equal, metric-strength sensitivity where
    wasserstein1 is the plain transport cost.

    In 1-D every expectation is an EDF integral on the pooled
    grid: E|X−Y| = Σ Δk·(CX·(m−CY) + CY·(n−CX))/(n·m) and
    E|X−X'| = Σ Δk·2·CX·(n−CX)/n², so the three numerators are
    exact Python ints (HUGEINT oracle) over the shared histogram
    and D² = 2A/(nm·100) − B/(n²·100) − C/(m²·100) is the one
    mirrored float expression."""
    hist = _two_sample_hist(ds, type_col, val_col, type_x, type_y)
    cols = {"n_x": pd.Series(dtype="int64"),
            "n_y": pd.Series(dtype="int64"),
            "e_xy": pd.Series(dtype="float64"),
            "e_xx": pd.Series(dtype="float64"),
            "e_yy": pd.Series(dtype="float64"),
            "energy_d2": pd.Series(dtype="float64")}
    if len(hist) == 0:
        return pd.DataFrame(cols)
    k = hist["k"].to_numpy(np.int64)
    cx = hist["cx"].to_numpy(np.int64)
    cy = hist["cy"].to_numpy(np.int64)
    n, m = int(cx.sum()), int(cy.sum())
    if n == 0 or m == 0 or len(k) < 2:
        return pd.DataFrame(cols)
    CX = np.cumsum(cx)
    CY = np.cumsum(cy)
    gaps = np.diff(k)
    A = B = C = 0
    for g, Cx, Cy in zip(gaps, CX[:-1], CY[:-1]):
        gi, cxi, cyi = int(g), int(Cx), int(Cy)
        A += gi * (cxi * (m - cyi) + cyi * (n - cxi))
        B += gi * 2 * cxi * (n - cxi)
        C += gi * 2 * cyi * (m - cyi)
    exy = float(A) / (float(n) * float(m) * 100.0)
    exx = float(B) / (float(n) * float(n) * 100.0)
    eyy = float(C) / (float(m) * float(m) * 100.0)
    return pd.DataFrame({
        "n_x": np.array([n], np.int64),
        "n_y": np.array([m], np.int64),
        "e_xy": [exy], "e_xx": [exx], "e_yy": [eyy],
        "energy_d2": [2.0 * exy - exx - eyy]})


def lepage_test(
    ds: ray.data.Dataset,
    type_col: str = "event_type",
    val_col: str = "value",
    type_x: str = "click",
    type_y: str = "view",
) -> pd.DataFrame:
    """Lepage two-sample location–scale omnibus: L = z_W² + z_A² —
    the tie-corrected Wilcoxon rank-sum z (location) plus the
    Ansari–Bradley z (scale), both over the shared exact value
    histogram.  Cucconi's classical rival (squared-rank ellipse vs
    component sum); having both lets drift monitoring distinguish
    "moved", "spread", and "both".

    Exactness: doubled midranks r2 and both-end scores a2 are
    int64; W2 = Σcx·r2, the tie term T = Σ(l³−l), and the Ansari
    moments S1/S2 are exact Python ints (HUGEINT oracle); the two
    z closings and L are the mirrored float expressions."""
    hist = _two_sample_hist(ds, type_col, val_col, type_x, type_y)
    cols = {"n_x": pd.Series(dtype="int64"),
            "n_y": pd.Series(dtype="int64"),
            "z_wilcoxon": pd.Series(dtype="float64"),
            "z_ansari": pd.Series(dtype="float64"),
            "lepage_l": pd.Series(dtype="float64")}
    if len(hist) == 0:
        return pd.DataFrame(cols)
    cx = [int(v) for v in hist["cx"]]
    cy = [int(v) for v in hist["cy"]]
    n, m = sum(cx), sum(cy)
    N = n + m
    if n == 0 or m == 0 or N < 3:
        return pd.DataFrame(cols)
    less = 0
    w2 = 0          # doubled Wilcoxon rank sum of X
    tie3 = 0        # Σ (l³ − l)
    aw2 = s1 = s2 = 0
    for cxk, cyk in zip(cx, cy):
        lk = cxk + cyk
        r2 = 2 * less + lk + 1
        w2 += cxk * r2
        tie3 += lk * lk * lk - lk
        a2 = min(r2, 2 * (N + 1) - r2)
        aw2 += cxk * a2
        s1 += lk * a2
        s2 += lk * a2 * a2
        less += lk
    # Wilcoxon: var·12·N·(N−1) = n·m·((N+1)·N·(N−1) − T)
    aa = (N + 1) * N * (N - 1) - tie3
    if aa <= 0:
        return pd.DataFrame(cols)
    zw = float(w2 - n * (N + 1)) \
        / (2.0 * np.sqrt(float(n * m * aa)
                         / float(12 * N * (N - 1))))
    var_num = n * m * (N * s2 - s1 * s1)
    if var_num <= 0:
        return pd.DataFrame(cols)
    za = float(N * aw2 - n * s1) \
        / float(np.sqrt(float(var_num) / float(N - 1)))
    return pd.DataFrame({
        "n_x": np.array([n], np.int64),
        "n_y": np.array([m], np.int64),
        "z_wilcoxon": [zw], "z_ansari": [za],
        "lepage_l": [zw * zw + za * za]})


def qte_profile(
    ds: ray.data.Dataset,
    type_col: str = "event_type",
    val_col: str = "value",
    type_x: str = "click",
    type_y: str = "view",
) -> pd.DataFrame:
    """Quantile treatment effects at the quartiles: the per-group
    type-1 (inverse-EDF) 25/50/75 % order statistics and their
    differences — where hodges_lehmann reports ONE robust shift,
    this reads the shift at three depths and shows whether a
    treatment moved the tails or the middle.

    Entirely exact: quantile q_p = smallest value with
    cum ≥ ⌈p·n⌉ on the shared integer histogram; the three
    qte_* closings descale the integer differences by /100."""
    hist = _two_sample_hist(ds, type_col, val_col, type_x, type_y)
    cols = {"n_x": pd.Series(dtype="int64"),
            "n_y": pd.Series(dtype="int64"),
            "q25_x": pd.Series(dtype="int64"),
            "q50_x": pd.Series(dtype="int64"),
            "q75_x": pd.Series(dtype="int64"),
            "q25_y": pd.Series(dtype="int64"),
            "q50_y": pd.Series(dtype="int64"),
            "q75_y": pd.Series(dtype="int64"),
            "qte_25": pd.Series(dtype="float64"),
            "qte_50": pd.Series(dtype="float64"),
            "qte_75": pd.Series(dtype="float64")}
    if len(hist) == 0:
        return pd.DataFrame(cols)
    k = hist["k"].to_numpy(np.int64)
    cx = hist["cx"].to_numpy(np.int64)
    cy = hist["cy"].to_numpy(np.int64)
    n, m = int(cx.sum()), int(cy.sum())
    if n == 0 or m == 0:
        return pd.DataFrame(cols)
    CX, CY = np.cumsum(cx), np.cumsum(cy)

    def q(cum, tot, pnum, pden):
        r = (tot * pnum + pden - 1) // pden   # ⌈p·tot⌉
        return int(k[int(np.searchsorted(cum, r))])

    qx = [q(CX, n, p, 4) for p in (1, 2, 3)]
    qy = [q(CY, m, p, 4) for p in (1, 2, 3)]
    return pd.DataFrame({
        "n_x": np.array([n], np.int64),
        "n_y": np.array([m], np.int64),
        "q25_x": np.array([qx[0]], np.int64),
        "q50_x": np.array([qx[1]], np.int64),
        "q75_x": np.array([qx[2]], np.int64),
        "q25_y": np.array([qy[0]], np.int64),
        "q50_y": np.array([qy[1]], np.int64),
        "q75_y": np.array([qy[2]], np.int64),
        "qte_25": [float(qy[0] - qx[0]) / 100.0],
        "qte_50": [float(qy[1] - qx[1]) / 100.0],
        "qte_75": [float(qy[2] - qx[2]) / 100.0]})


def yuen_trimmed(
    ds: ray.data.Dataset,
    type_col: str = "event_type",
    val_col: str = "value",
    type_x: str = "click",
    type_y: str = "view",
    trim_pct: int = 20,
) -> pd.DataFrame:
    """Yuen's trimmed-mean two-sample test (20 % default): compares
    the central 60 % of each distribution with winsorized-variance
    standard errors — the robust-location member of the ladder
    (welch_ttest breaks under heavy tails; wilcoxon reads ranks
    only; Yuen keeps the value scale AND the robustness).

    Everything before the closing is exact on the shared integer
    histogram: trim depth g = ⌊n·trim/100⌋, the trimmed-range cell
    counts max(0, min(cum, n−g) − max(cum−c, g)), the trimmed sums
    St/Qt and the winsorized corrections g·(lo + hi) /
    g·(lo² + hi²) are all int64 (HUGEINT oracle for Q).  The
    closings mirror float-for-float: SSw = Qw − Sw²/n,
    d = SSw/(h(h−1)), t = (St_x/h_x − St_y/h_y)/(100·√(d_x+d_y))
    — descaled to value units."""
    hist = _two_sample_hist(ds, type_col, val_col, type_x, type_y)
    cols = {"n_x": pd.Series(dtype="int64"),
            "n_y": pd.Series(dtype="int64"),
            "h_x": pd.Series(dtype="int64"),
            "h_y": pd.Series(dtype="int64"),
            "tmean_x": pd.Series(dtype="float64"),
            "tmean_y": pd.Series(dtype="float64"),
            "yuen_t": pd.Series(dtype="float64")}
    if len(hist) == 0:
        return pd.DataFrame(cols)
    k = hist["k"].to_numpy(np.int64)

    def side(c):
        n = int(c.sum())
        if n == 0:
            return None
        g = n * trim_pct // 100
        h = n - 2 * g
        if h <= 1:
            return None
        cum = np.cumsum(c)
        lo = int(k[int(np.searchsorted(cum, g + 1))])
        hi = int(k[int(np.searchsorted(cum, n - g))])
        tc = np.maximum(
            0, np.minimum(cum, n - g) - np.maximum(cum - c, g))
        st = int((k * tc).sum())
        qt = sum(int(kk) * int(kk) * int(cc)
                 for kk, cc in zip(k, tc) if cc)
        sw = st + g * (lo + hi)
        qw = qt + g * (lo * lo + hi * hi)
        ssw = float(qw) - float(sw) * float(sw) / float(n)
        d = ssw / float(h * (h - 1))
        return n, h, st, d

    sx = side(hist["cx"].to_numpy(np.int64))
    sy = side(hist["cy"].to_numpy(np.int64))
    if sx is None or sy is None:
        return pd.DataFrame(cols)
    n_x, h_x, st_x, d_x = sx
    n_y, h_y, st_y, d_y = sy
    if d_x + d_y <= 0.0:
        return pd.DataFrame(cols)
    tm_x = float(st_x) / float(h_x)
    tm_y = float(st_y) / float(h_y)
    # t is scale-free (the /100 descales cancel) — mirror the
    # k-space expression verbatim
    t = (tm_x - tm_y) / np.sqrt(d_x + d_y)
    return pd.DataFrame({
        "n_x": np.array([n_x], np.int64),
        "n_y": np.array([n_y], np.int64),
        "h_x": np.array([h_x], np.int64),
        "h_y": np.array([h_y], np.int64),
        "tmean_x": [tm_x / 100.0],
        "tmean_y": [tm_y / 100.0],
        "yuen_t": [t]})


def hill_tail(
    ds: ray.data.Dataset,
    val_col: str = "value",
    tail_k: int = 100,
) -> pd.DataFrame:
    """Hill estimator of the upper-tail index over positive values:
    α̂ = 1/H with H = (1/k)·Σ_{i≤k} ln(x_(i)/x_(k+1)) on the k
    largest observations — the standard POT tail-heaviness number
    next to gumbel_maxima (block maxima) and pareto_concentration
    (share curve).

    Counts per value cell are exact; the ln terms accumulate in
    DESCENDING value order as an explicit sequential prefix sum —
    the same ordered-window device the kaplan_meier oracle uses —
    so the float path is reproducible; H and α̂ are the mirrored
    closings."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        kk = np.rint(df[val_col].to_numpy(np.float64) * 100.0) \
            .astype(np.int64)
        kk = kk[kk >= 1]
        g = pd.DataFrame({"k": kk})
        c = g.groupby("k", as_index=False).size()
        return c.rename(columns={"size": "c"})

    hist = ds.select_columns([val_col]).map_batches(
        partial, batch_format="pandas").to_pandas()
    cols = {"n_pos": pd.Series(dtype="int64"),
            "tail_k": pd.Series(dtype="int64"),
            "x_ref": pd.Series(dtype="int64"),
            "hill_h": pd.Series(dtype="float64"),
            "alpha": pd.Series(dtype="float64")}
    if hist.empty:
        return pd.DataFrame(cols)
    hist = hist.groupby("k", as_index=False)["c"].sum() \
        .sort_values("k", ascending=False).reset_index(drop=True)
    k = hist["k"].to_numpy(np.int64)
    c = hist["c"].to_numpy(np.int64)
    n = int(c.sum())
    if n < tail_k + 1:
        return pd.DataFrame(cols)
    cum = np.cumsum(c)
    # k largest values, clipped per descending cell
    tc = np.maximum(0, np.minimum(cum, tail_k)
                    - np.maximum(cum - c, 0))
    ref = int(k[int(np.searchsorted(cum, tail_k + 1))])
    sln = 0.0
    for kv, cc in zip(k, tc):     # descending-k sequential sum
        if cc:
            sln = sln + float(int(cc)) * float(np.log(float(kv)))
    h = (sln - float(tail_k) * float(np.log(float(ref)))) \
        / float(tail_k)
    if h <= 0.0:
        return pd.DataFrame(cols)
    return pd.DataFrame({
        "n_pos": np.array([n], np.int64),
        "tail_k": np.array([tail_k], np.int64),
        "x_ref": np.array([ref], np.int64),
        "hill_h": [h],
        "alpha": [1.0 / h]})


def rmst(
    ds: ray.data.Dataset,
    key: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    start_type: str = "signup",
    event_type: str = "purchase",
    num_partitions: int = 16,
) -> pd.DataFrame:
    """Restricted mean survival time: RMST(τ) = ∫₀^τ S(t)dt under
    the same Kaplan–Meier curve as ``kaplan_meier`` (identical
    cells, censor rule and log-sum-exp S values), with
    τ = the longest duration observed (censored included) — the
    "average µs until conversion, capped at the horizon" summary a
    curve can't give in one number.

    The integral accumulates S_prev·Δt sequentially in ascending
    event-time order (the same ordered-prefix device the KM oracle
    uses), so engine and SQL walk identical float op sequences;
    durations, τ and all counts are exact int64."""
    from .partition import group_apply

    def per_key(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for uid, g in df.groupby(key, observed=True):
            tus = g[ts_col].to_numpy("datetime64[us]").view(np.int64)
            et = g[type_col].to_numpy()
            st = tus[et == start_type]
            if not len(st):
                out.append((int(uid), -1, -1, int(tus.max())))
                continue
            t0 = int(st.min())
            ev = tus[(et == event_type) & (tus > t0)]
            out.append((int(uid), t0,
                        int(ev.min()) if len(ev) else -1,
                        int(tus.max())))
        return pd.DataFrame(out, columns=[key, "t0", "tp", "tmax"])

    cells = group_apply(
        ds.select_columns([key, type_col, ts_col]),
        per_key, num_partitions=num_partitions, key=key,
    ).to_pandas()
    cols = {"n_durations": pd.Series(dtype="int64"),
            "n_events": pd.Series(dtype="int64"),
            "tau_us": pd.Series(dtype="int64"),
            "rmst_days": pd.Series(dtype="float64"),
            "rmst_share": pd.Series(dtype="float64")}
    if not len(cells):
        return pd.DataFrame(cols)
    tmax = int(cells["tmax"].max())
    cells = cells[cells["t0"] >= 0]
    if not len(cells):
        return pd.DataFrame(cols)
    obs = cells["tp"].to_numpy(np.int64) >= 0
    dur = np.where(obs, cells["tp"].to_numpy(np.int64),
                   tmax) - cells["t0"].to_numpy(np.int64)
    tau = int(dur.max())
    evt_times = np.unique(dur[obs])
    if not len(evt_times) or tau <= 0:
        return pd.DataFrame(cols)
    acc = 0.0
    logsum = 0.0
    s_prev = 1.0
    t_prev = 0
    for t in evt_times:
        n_risk = int((dur >= t).sum())
        d = int((dur[obs] == t).sum())
        acc = acc + s_prev * float(int(t) - t_prev)
        logsum += float(np.log(1.0 - float(d) / n_risk)) \
            if d < n_risk else float("-inf")
        s_prev = float(np.exp(logsum))
        t_prev = int(t)
    r = acc + s_prev * float(tau - t_prev)
    # report in DAYS, not µs: the ~1e11-µs magnitude would expose
    # the last-ulp difference between this sequential walk and the
    # oracle's windowed prefix sum (DuckDB's window aggregate is
    # segment-tree-ordered, not strictly sequential); at O(1) days
    # the 6-decimal compare absorbs it, as kaplan_meier's S does
    return pd.DataFrame({
        "n_durations": np.array([len(dur)], np.int64),
        "n_events": np.array([int(obs.sum())], np.int64),
        "tau_us": np.array([tau], np.int64),
        "rmst_days": [r / 86400000000.0],
        "rmst_share": [r / float(tau)]})


def gehan_wilcoxon(
    ds: ray.data.Dataset,
    key: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    start_type: str = "signup",
    event_type: str = "purchase",
    num_partitions: int = 16,
) -> pd.DataFrame:
    """Gehan's generalized Wilcoxon test for right-censored
    durations between two cohorts (even vs odd key — the
    deterministic A/B split): does time-to-conversion differ?  The
    censoring-aware TEST that completes the survival family next
    to kaplan_meier (the curve) and rmst (the summary).

    Durations/censor rule are identical to kaplan_meier's cells.
    Definite orderings only: i beats j iff j converted AND
    (t_i > t_j, or t_i = t_j with i censored).  Per-subject Gehan
    scores G = A − B come from exact cumulative (duration, status)
    histogram counts; W = Σ_{cohort A} G and the permutation
    variance n·m·ΣG²/(N(N−1)) use Python-int/HUGEINT sums (G² is
    O(N²), overflows int64 at ~10⁵ subjects); z = W/√Var is the
    one closing."""
    from .partition import group_apply

    def per_key(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for uid, g in df.groupby(key, observed=True):
            tus = g[ts_col].to_numpy("datetime64[us]").view(np.int64)
            et = g[type_col].to_numpy()
            st = tus[et == start_type]
            if not len(st):
                out.append((int(uid), -1, -1, int(tus.max())))
                continue
            t0 = int(st.min())
            ev = tus[(et == event_type) & (tus > t0)]
            out.append((int(uid), t0,
                        int(ev.min()) if len(ev) else -1,
                        int(tus.max())))
        return pd.DataFrame(out, columns=[key, "t0", "tp", "tmax"])

    cells = group_apply(
        ds.select_columns([key, type_col, ts_col]),
        per_key, num_partitions=num_partitions, key=key,
    ).to_pandas()
    cols = {"n_a": pd.Series(dtype="int64"),
            "n_b": pd.Series(dtype="int64"),
            "w_gehan": pd.Series(dtype="int64"),
            "z_stat": pd.Series(dtype="float64")}
    if not len(cells):
        return pd.DataFrame(cols)
    tmax = int(cells["tmax"].max())
    cells = cells[cells["t0"] >= 0]
    if not len(cells):
        return pd.DataFrame(cols)
    obs = cells["tp"].to_numpy(np.int64) >= 0
    dur = np.where(obs, cells["tp"].to_numpy(np.int64),
                   tmax) - cells["t0"].to_numpy(np.int64)
    grp_a = (cells[key].to_numpy(np.int64) % 2) == 0
    n, m = int(grp_a.sum()), int((~grp_a).sum())
    if n == 0 or m == 0:
        return pd.DataFrame(cols)
    N = n + m
    # pooled (duration, status) histogram with cumulative counts
    hdf = pd.DataFrame({"t": dur, "o": obs.astype(np.int64)})
    hist = hdf.groupby("t", as_index=False).agg(
        c_all=("o", "size"), c_obs=("o", "sum")) \
        .sort_values("t").reset_index(drop=True)
    ht = hist["t"].to_numpy(np.int64)
    call = hist["c_all"].to_numpy(np.int64)
    cobs = hist["c_obs"].to_numpy(np.int64)
    cum_all = np.cumsum(call)
    cum_obs = np.cumsum(cobs)
    idx = np.searchsorted(ht, dur)
    obs_lt = cum_obs[idx] - cobs[idx]          # observed with t < t_i
    obs_eq = cobs[idx]
    all_gt = int(cum_all[-1]) - cum_all[idx]   # subjects with t > t_i
    cens_eq = call[idx] - cobs[idx]
    oi = obs.astype(np.int64)
    # A_i: observed strictly before, plus observed at t_i when i
    # is censored; B_i (only if i observed): later subjects plus
    # same-time censored
    A = obs_lt + (1 - oi) * obs_eq
    B = oi * (all_gt + cens_eq)                # self never counted
    G = A - B
    W = int(G[grp_a].sum())
    sg2 = sum(int(g) * int(g) for g in G)
    var_num = n * m * sg2
    if var_num <= 0:
        return pd.DataFrame(cols)
    z = float(W) / float(np.sqrt(float(var_num)
                                 / float(N * (N - 1))))
    return pd.DataFrame({
        "n_a": np.array([n], np.int64),
        "n_b": np.array([m], np.int64),
        "w_gehan": np.array([W], np.int64),
        "z_stat": [z]})


def cuped_effect(
    ds: ray.data.Dataset,
    key: str = "user_id",
    ts_col: str = "ts",
    val_col: str = "value",
    num_partitions: int = 16,
) -> pd.DataFrame:
    """CUPED (controlled-experiment using pre-experiment data,
    Deng et al., WSDM 2013): the variance-reduced treatment-effect
    estimate ŷ_cuped = ȳ − θ·x̄ per cohort with θ = cov(x,y)/var(x)
    fit on the pooled users — x is each user's PRE-period value sum
    (first half of the global time range), y the post-period sum,
    treatment the deterministic odd-key cohort.  Reports raw vs
    adjusted effect and ρ² (the variance fraction CUPED removes).

    Per-user (x, y) cells are exact int64 k-space sums through one
    keyed exchange; every pooled/cohort moment (Σx, Σxy, Σx², …)
    is an exact Python-int/HUGEINT partial; θ, the two effects and
    ρ² are the mirrored float closings (descaled /100)."""
    from .partition import group_apply

    t0 = int(pd.Timestamp(ds.min(ts_col)).value) // 1000
    t1 = int(pd.Timestamp(ds.max(ts_col)).value) // 1000
    tmid = (t0 + t1) // 2

    def per_key(df: pd.DataFrame) -> pd.DataFrame:
        tus = df[ts_col].to_numpy("datetime64[us]").view(np.int64)
        k = np.rint(df[val_col].to_numpy(np.float64) * 100.0) \
            .astype(np.int64)
        pre = tus <= tmid
        g = pd.DataFrame({key: df[key].to_numpy(),
                          "x": np.where(pre, k, 0),
                          "y": np.where(pre, 0, k)})
        u = g.groupby(key, as_index=False)[["x", "y"]].sum()
        t = (u[key].to_numpy(np.int64) % 2) == 1
        x = u["x"].to_numpy(np.int64)
        y = u["y"].to_numpy(np.int64)
        return pd.DataFrame({
            "nu": [np.int64(len(u))],
            "sx": [int(x.sum())], "sy": [int(y.sum())],
            "sxy": [sum(int(a) * int(b) for a, b in zip(x, y))],
            "sx2": [sum(int(a) * int(a) for a in x)],
            "sy2": [sum(int(b) * int(b) for b in y)],
            "n_t": [np.int64(int(t.sum()))],
            "sx_t": [int(x[t].sum())], "sy_t": [int(y[t].sum())],
            "n_c": [np.int64(int((~t).sum()))],
            "sx_c": [int(x[~t].sum())],
            "sy_c": [int(y[~t].sum())]})

    parts = group_apply(
        ds.select_columns([key, ts_col, val_col]),
        per_key, num_partitions=num_partitions, key=key,
    ).to_pandas()
    cols = {"n_users": pd.Series(dtype="int64"),
            "n_treat": pd.Series(dtype="int64"),
            "theta": pd.Series(dtype="float64"),
            "raw_effect": pd.Series(dtype="float64"),
            "cuped_effect": pd.Series(dtype="float64"),
            "rho2": pd.Series(dtype="float64")}
    if parts.empty:
        return pd.DataFrame(cols)
    nu = int(parts["nu"].sum())
    sx = sum(int(v) for v in parts["sx"])
    sy = sum(int(v) for v in parts["sy"])
    sxy = sum(int(v) for v in parts["sxy"])
    sx2 = sum(int(v) for v in parts["sx2"])
    sy2 = sum(int(v) for v in parts["sy2"])
    n_t = int(parts["n_t"].sum())
    sx_t = sum(int(v) for v in parts["sx_t"])
    sy_t = sum(int(v) for v in parts["sy_t"])
    n_c = int(parts["n_c"].sum())
    sx_c = sum(int(v) for v in parts["sx_c"])
    sy_c = sum(int(v) for v in parts["sy_c"])
    vx = nu * sx2 - sx * sx
    vy = nu * sy2 - sy * sy
    if n_t == 0 or n_c == 0 or vx <= 0 or vy <= 0:
        return pd.DataFrame(cols)
    cxy = nu * sxy - sx * sy
    theta = float(cxy) / float(vx)
    raw_k = float(sy_t) / float(n_t) - float(sy_c) / float(n_c)
    rawx_k = float(sx_t) / float(n_t) - float(sx_c) / float(n_c)
    rho2 = float(cxy) * float(cxy) / (float(vx) * float(vy))
    return pd.DataFrame({
        "n_users": np.array([nu], np.int64),
        "n_treat": np.array([n_t], np.int64),
        "theta": [theta],
        "raw_effect": [raw_k / 100.0],
        "cuped_effect": [(raw_k - theta * rawx_k) / 100.0],
        "rho2": [rho2]})


def did_effect(
    ds: ray.data.Dataset,
    key: str = "user_id",
    ts_col: str = "ts",
    val_col: str = "value",
    num_partitions: int = 16,
) -> pd.DataFrame:
    """Difference-in-differences on per-event value means: cohorts
    are the deterministic odd-key treatment split, periods the two
    halves of the global time range, and
    DiD = (post_t − pre_t) − (post_c − pre_c) — the causal
    baseline that CUPED refines; reporting both lets a pipeline
    show parallel-trends health alongside the adjusted effect.

    Four exact (cohort, period) cells of (Σk, count) through
    map-side partials — no keyed exchange at all; the four means
    and the DiD closing are the mirrored floats (descaled /100)."""
    t0 = int(pd.Timestamp(ds.min(ts_col)).value) // 1000
    t1 = int(pd.Timestamp(ds.max(ts_col)).value) // 1000
    tmid = (t0 + t1) // 2

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        tus = df[ts_col].to_numpy("datetime64[us]").view(np.int64)
        k = np.rint(df[val_col].to_numpy(np.float64) * 100.0) \
            .astype(np.int64)
        treat = (df[key].to_numpy(np.int64) % 2) == 1
        post = tus > tmid
        g = pd.DataFrame({"t": treat.astype(np.int64),
                          "p": post.astype(np.int64), "k": k})
        c = g.groupby(["t", "p"], as_index=False).agg(
            s=("k", "sum"), n=("k", "size"))
        return c

    cells = ds.select_columns([key, ts_col, val_col]).map_batches(
        partial, batch_format="pandas").to_pandas() \
        .groupby(["t", "p"], as_index=False)[["s", "n"]].sum()
    cols = {"mean_pre_c": pd.Series(dtype="float64"),
            "mean_post_c": pd.Series(dtype="float64"),
            "mean_pre_t": pd.Series(dtype="float64"),
            "mean_post_t": pd.Series(dtype="float64"),
            "did": pd.Series(dtype="float64")}
    if len(cells) < 4:
        return pd.DataFrame(cols)
    m = {}
    for _, r in cells.iterrows():
        m[(int(r["t"]), int(r["p"]))] = \
            float(int(r["s"])) / float(int(r["n"])) / 100.0
    did = (m[(1, 1)] - m[(1, 0)]) - (m[(0, 1)] - m[(0, 0)])
    return pd.DataFrame({
        "mean_pre_c": [m[(0, 0)]], "mean_post_c": [m[(0, 1)]],
        "mean_pre_t": [m[(1, 0)]], "mean_post_t": [m[(1, 1)]],
        "did": [did]})


def sprt_conversion(
    ds: ray.data.Dataset,
    key: str = "user_id",
    type_col: str = "event_type",
    convert_type: str = "purchase",
    p0: float = 0.3,
    p1: float = 0.4,
    alpha: float = 0.05,
    beta: float = 0.05,
) -> pd.DataFrame:
    """Wald's sequential probability ratio test on the per-key
    conversion rate (did the key ever fire ``convert_type``): walk
    keys in key order and stop the first time the log-likelihood
    ratio leaves (ln(β/(1−α)), ln((1−β)/α)) — the streaming A/B
    stopping rule that fixed-horizon tests can't give.

    No float ever ACCUMULATES: after i keys with c conversions the
    LLR is the closed form c·ln(p1/p0) + (i−c)·ln((1−p1)/(1−p0)),
    an exact-int pair times two constants — so the crossing index
    is a per-row mirrored comparison over the cumulative
    conversion counts, immune to summation order."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        conv = df.groupby(key, observed=True)[type_col].agg(
            lambda s: int((s.to_numpy(object)
                           == convert_type).any()))
        return pd.DataFrame({key: conv.index.to_numpy(np.int64),
                             "c": conv.to_numpy(np.int64)})

    users = ds.select_columns([key, type_col]).map_batches(
        partial, batch_format="pandas").to_pandas() \
        .groupby(key, as_index=False)["c"].max() \
        .sort_values(key).reset_index(drop=True)
    cols = {"n_keys": pd.Series(dtype="int64"),
            "n_conversions": pd.Series(dtype="int64"),
            "decision": pd.Series(dtype=object),
            "n_at_decision": pd.Series(dtype="int64"),
            "llr_final": pd.Series(dtype="float64")}
    if users.empty:
        return pd.DataFrame(cols)
    la = float(np.log(p1 / p0))
    lb = float(np.log((1.0 - p1) / (1.0 - p0)))
    up = float(np.log((1.0 - beta) / alpha))
    lo = float(np.log(beta / (1.0 - alpha)))
    c = np.cumsum(users["c"].to_numpy(np.int64))
    i = np.arange(1, len(users) + 1, dtype=np.int64)
    llr = c.astype(np.float64) * la \
        + (i - c).astype(np.float64) * lb
    hit_up = llr >= up
    hit_lo = llr <= lo
    hit = hit_up | hit_lo
    if hit.any():
        j = int(np.argmax(hit))
        dec = "reject_h0" if bool(hit_up[j]) else "accept_h0"
        nd = int(i[j])
        lf = float(llr[j])
    else:
        dec, nd, lf = "continue", int(i[-1]), float(llr[-1])
    return pd.DataFrame({
        "n_keys": np.array([len(users)], np.int64),
        "n_conversions": np.array([int(c[-1])], np.int64),
        "decision": [dec],
        "n_at_decision": np.array([nd], np.int64),
        "llr_final": [lf]})


def mutual_information(
    ds: ray.data.Dataset,
    col_a: str = "event_type",
    col_b: str = "hour",
    ts_col: str = "ts",
    num_partitions: int = 8,
) -> pd.DataFrame:
    """Mutual information and Theil's uncertainty coefficients
    between two bounded-alphabet columns (event type × hour of
    day): I(A;B) = H(A) + H(B) − H(A,B) in nats, U(A|B) =
    I/H(A), U(B|A) = I/H(B) — the information-theoretic
    association triple next to chi_square (significance) and
    cramers_v (effect size); U is the asymmetric "how much does
    knowing the hour tell you about the type".

    Counts are exact int64 cells (one bounded exchange); every
    entropy is a sum of c·(ln n − ln c) terms accumulated in a
    FIXED cell order (lexicographic by value) — the ordered-prefix
    float device — then three mirrored closings."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        tus = df[ts_col].to_numpy("datetime64[us]").view(np.int64)
        hr = (tus // 3_600_000_000) % 24
        g = pd.DataFrame({"a": df[col_a].to_numpy(object),
                          "b": hr})
        return g.groupby(["a", "b"], as_index=False).size() \
            .rename(columns={"size": "c"})

    cells = ds.select_columns([col_a, ts_col]).map_batches(
        partial, batch_format="pandas").to_pandas() \
        .groupby(["a", "b"], as_index=False)["c"].sum()
    cols = {"n": pd.Series(dtype="int64"),
            "h_a": pd.Series(dtype="float64"),
            "h_b": pd.Series(dtype="float64"),
            "h_ab": pd.Series(dtype="float64"),
            "mi": pd.Series(dtype="float64"),
            "u_a_given_b": pd.Series(dtype="float64"),
            "u_b_given_a": pd.Series(dtype="float64")}
    if cells.empty:
        return pd.DataFrame(cols)
    n = int(cells["c"].sum())
    nf = float(n)
    lnn = float(np.log(nf))

    def ent(counts_df, keys):
        # H·n = Σ c·(ln n − ln c), accumulated in sorted key order
        s = counts_df.sort_values(keys, kind="mergesort")
        acc = 0.0
        for c in s["c"]:
            ci = float(int(c))
            acc = acc + ci * (lnn - float(np.log(ci)))
        return acc / nf

    ha = ent(cells.groupby("a", as_index=False)["c"].sum(), ["a"])
    hb = ent(cells.groupby("b", as_index=False)["c"].sum(), ["b"])
    hab = ent(cells, ["a", "b"])
    mi = ha + hb - hab
    if ha <= 0.0 or hb <= 0.0:
        return pd.DataFrame(cols)
    return pd.DataFrame({
        "n": np.array([n], np.int64),
        "h_a": [ha], "h_b": [hb], "h_ab": [hab], "mi": [mi],
        "u_a_given_b": [mi / ha], "u_b_given_a": [mi / hb]})


def peacock_ks2d(
    ds: ray.data.Dataset,
    type_col: str = "event_type",
    val_col: str = "value",
    ts_col: str = "ts",
    type_x: str = "click",
    type_y: str = "view",
) -> pd.DataFrame:
    """Peacock's two-dimensional KS test between the click and view
    populations over (value, hour-of-day): D = the max |F−G| over
    all four quadrant orientations at every occupied grid point —
    the 2-D drift test that catches joint-distribution changes the
    marginal ks/kuiper/W1 ladder can't see (e.g. values unchanged,
    hours unchanged, but the value-by-hour pattern rotated).

    Exact throughout: the (k, hour) grid counts are int64 cells,
    the four quadrant EDFs are 2-D integer prefix sums, and the
    deviation max is over exact |m·CX − n·CY| values; D = that
    max/(n·m) is the single closing."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        v = df[val_col].to_numpy(np.float64)
        t = df[type_col].to_numpy(object)
        tus = df[ts_col].to_numpy("datetime64[us]").view(np.int64)
        ok = ~np.isnan(v) & ((t == type_x) | (t == type_y))
        k = np.rint(v[ok] * 100.0).astype(np.int64)
        hr = (tus[ok] // 3_600_000_000) % 24
        isx = (t[ok] == type_x).astype(np.int64)
        g = pd.DataFrame({"k": k, "h": hr, "cx": isx,
                          "cy": 1 - isx})
        return g.groupby(["k", "h"], as_index=False).sum()

    cells = ds.select_columns([type_col, val_col, ts_col]) \
        .map_batches(partial, batch_format="pandas").to_pandas() \
        .groupby(["k", "h"], as_index=False)[["cx", "cy"]].sum()
    cols = {"n_x": pd.Series(dtype="int64"),
            "n_y": pd.Series(dtype="int64"),
            "d_max_nm": pd.Series(dtype="int64"),
            "d_stat": pd.Series(dtype="float64")}
    if cells.empty:
        return pd.DataFrame(cols)
    ks = np.sort(cells["k"].unique())
    hs = np.sort(cells["h"].unique())
    ki = {v: i for i, v in enumerate(ks)}
    hi = {v: i for i, v in enumerate(hs)}
    X = np.zeros((len(ks), len(hs)), np.int64)
    Y = np.zeros((len(ks), len(hs)), np.int64)
    X[[ki[v] for v in cells["k"]], [hi[v] for v in cells["h"]]] \
        = cells["cx"].to_numpy(np.int64)
    Y[[ki[v] for v in cells["k"]], [hi[v] for v in cells["h"]]] \
        = cells["cy"].to_numpy(np.int64)
    n, m = int(X.sum()), int(Y.sum())
    if n == 0 or m == 0:
        return pd.DataFrame(cols)
    best = 0
    for fk in (False, True):
        for fh in (False, True):
            A = X[::-1] if fk else X
            A = A[:, ::-1] if fh else A
            B = Y[::-1] if fk else Y
            B = B[:, ::-1] if fh else B
            CA = A.cumsum(axis=0).cumsum(axis=1)
            CB = B.cumsum(axis=0).cumsum(axis=1)
            d = np.abs(m * CA - n * CB).max()
            best = max(best, int(d))
    return pd.DataFrame({
        "n_x": np.array([n], np.int64),
        "n_y": np.array([m], np.int64),
        "d_max_nm": np.array([best], np.int64),
        "d_stat": [float(best) / (float(n) * float(m))]})


def anderson_darling_2s(
    ds: ray.data.Dataset,
    type_col: str = "event_type",
    val_col: str = "value",
    type_x: str = "click",
    type_y: str = "view",
) -> pd.DataFrame:
    """Two-sample Anderson–Darling test in the Scholz–Stephens
    (1987) midrank form — the tail-weighted member that completes
    the EDF ladder (ks_drift reads the max gap, kuiper both tails,
    cvm the unweighted integral, AD up-weights the tails where
    drift hides first).

    With doubled midrank quantities M2 = 2·cum − f and
    B2 = 2·cum_pooled − l every per-cell term is a ratio of EXACT
    integers, l·(N·M2 − nᵢ·B2)² / (B2·(2N − B2) − N·l)
    (Python-int/HUGEINT; the numerator overflows int64 at ~10³
    pooled rows), divided term-by-term and accumulated in
    ascending cell order — the ordered-prefix float device — then
    closed as A² = (Σx/n + Σy/m)·(N−1)/N²."""
    hist = _two_sample_hist(ds, type_col, val_col, type_x, type_y)
    cols = {"n_x": pd.Series(dtype="int64"),
            "n_y": pd.Series(dtype="int64"),
            "a2_stat": pd.Series(dtype="float64")}
    if len(hist) == 0:
        return pd.DataFrame(cols)
    cx = [int(v) for v in hist["cx"]]
    cy = [int(v) for v in hist["cy"]]
    n, m = sum(cx), sum(cy)
    N = n + m
    if n == 0 or m == 0 or N < 3:
        return pd.DataFrame(cols)
    cum_x = cum_y = cum = 0
    sx = sy = 0.0
    for fx, fy in zip(cx, cy):
        lk = fx + fy
        m2x = 2 * (cum_x + fx) - fx
        m2y = 2 * (cum_y + fy) - fy
        b2 = 2 * (cum + lk) - lk
        den = b2 * (2 * N - b2) - N * lk
        if den > 0:
            dx = N * m2x - n * b2
            dy = N * m2y - m * b2
            sx = sx + float(lk * dx * dx) / float(den)
            sy = sy + float(lk * dy * dy) / float(den)
        cum_x += fx
        cum_y += fy
        cum += lk
    a2 = (sx / float(n) + sy / float(m)) \
        * float(N - 1) / (float(N) * float(N))
    return pd.DataFrame({
        "n_x": np.array([n], np.int64),
        "n_y": np.array([m], np.int64),
        "a2_stat": [a2]})


def two_proportion(
    ds: ray.data.Dataset,
    key: str = "user_id",
    type_col: str = "event_type",
    convert_type: str = "purchase",
    baseline_type: str = "error",
) -> pd.DataFrame:
    """Two-proportion z-test with Wilson 95 % intervals on the
    per-key success flag "more ``convert_type`` than
    ``baseline_type`` events" (mcnemar's per-user indicator), even
    vs odd cohorts — the conversion-rate A/B primitive underneath
    sprt (sequential) and auc_score (ranking): pooled-variance z
    plus a Wilson interval per cohort (the CI that behaves at
    extreme rates, unlike Wald).

    Flag counts are exact int64 cells (per-key type-count partials
    → comparison); z and the four Wilson bounds are mirrored float
    closings (z* = 1.96 literal)."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        t = df[type_col].to_numpy(object)
        g = pd.DataFrame({key: df[key].to_numpy(),
                          "p": (t == convert_type)
                          .astype(np.int64),
                          "e": (t == baseline_type)
                          .astype(np.int64)})
        return g.groupby(key, as_index=False)[["p", "e"]].sum()

    agg = ds.select_columns([key, type_col]).map_batches(
        partial, batch_format="pandas").to_pandas() \
        .groupby(key, as_index=False)[["p", "e"]].sum()
    users = pd.DataFrame({
        key: agg[key].to_numpy(np.int64),
        "c": (agg["p"].to_numpy(np.int64)
              > agg["e"].to_numpy(np.int64)).astype(np.int64)})
    cols = {"n_a": pd.Series(dtype="int64"),
            "n_b": pd.Series(dtype="int64"),
            "conv_a": pd.Series(dtype="int64"),
            "conv_b": pd.Series(dtype="int64"),
            "z_stat": pd.Series(dtype="float64"),
            "wilson_lo_a": pd.Series(dtype="float64"),
            "wilson_hi_a": pd.Series(dtype="float64"),
            "wilson_lo_b": pd.Series(dtype="float64"),
            "wilson_hi_b": pd.Series(dtype="float64")}
    if users.empty:
        return pd.DataFrame(cols)
    even = (users[key].to_numpy(np.int64) % 2) == 0
    c = users["c"].to_numpy(np.int64)
    na, nb = int(even.sum()), int((~even).sum())
    ca, cb = int(c[even].sum()), int(c[~even].sum())
    if na == 0 or nb == 0:
        return pd.DataFrame(cols)
    pa = float(ca) / float(na)
    pb = float(cb) / float(nb)
    pp = float(ca + cb) / float(na + nb)
    se2 = pp * (1.0 - pp) * (1.0 / float(na) + 1.0 / float(nb))
    if se2 <= 0.0:
        return pd.DataFrame(cols)
    z = (pa - pb) / np.sqrt(se2)
    zs = 1.96

    def wilson(p, nn):
        nf = float(nn)
        den = 1.0 + zs * zs / nf
        ctr = p + zs * zs / (2.0 * nf)
        rad = zs * np.sqrt(p * (1.0 - p) / nf
                           + zs * zs / (4.0 * nf * nf))
        return (ctr - rad) / den, (ctr + rad) / den

    la, ha = wilson(pa, na)
    lb, hb = wilson(pb, nb)
    return pd.DataFrame({
        "n_a": np.array([na], np.int64),
        "n_b": np.array([nb], np.int64),
        "conv_a": np.array([ca], np.int64),
        "conv_b": np.array([cb], np.int64),
        "z_stat": [float(z)],
        "wilson_lo_a": [la], "wilson_hi_a": [ha],
        "wilson_lo_b": [lb], "wilson_hi_b": [hb]})


def lincoln_petersen(
    ds: ray.data.Dataset,
    key: str = "user_id",
    ts_col: str = "ts",
) -> pd.DataFrame:
    """Lincoln–Petersen capture–recapture population estimate: the
    keys active in the first half of the time range are the
    "marked" sample, the second half the recapture, and
    N̂ = (n₁+1)(n₂+1)/(m+1) − 1 (Chapman's bias-corrected form)
    estimates how many keys exist INCLUDING the never-seen — the
    classic answer to "how big is the real user base" that
    distinct_users (seen only) cannot give.

    Membership counts are exact via per-key first/second-half
    flags (one bounded exchange); the Chapman estimate and its
    variance are mirrored float closings."""
    t0 = int(pd.Timestamp(ds.min(ts_col)).value) // 1000
    t1 = int(pd.Timestamp(ds.max(ts_col)).value) // 1000
    tmid = (t0 + t1) // 2

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        tus = df[ts_col].to_numpy("datetime64[us]").view(np.int64)
        g = pd.DataFrame({key: df[key].to_numpy(),
                          "a": (tus <= tmid).astype(np.int64),
                          "b": (tus > tmid).astype(np.int64)})
        return g.groupby(key, as_index=False)[["a", "b"]].max()

    users = ds.select_columns([key, ts_col]).map_batches(
        partial, batch_format="pandas").to_pandas() \
        .groupby(key, as_index=False)[["a", "b"]].max()
    cols = {"n_first": pd.Series(dtype="int64"),
            "n_second": pd.Series(dtype="int64"),
            "n_both": pd.Series(dtype="int64"),
            "n_hat": pd.Series(dtype="float64"),
            "var_hat": pd.Series(dtype="float64")}
    if users.empty:
        return pd.DataFrame(cols)
    a = users["a"].to_numpy(np.int64)
    b = users["b"].to_numpy(np.int64)
    n1, n2 = int(a.sum()), int(b.sum())
    mboth = int((a & b).sum())
    if n1 == 0 or n2 == 0:
        return pd.DataFrame(cols)
    nhat = float((n1 + 1) * (n2 + 1)) / float(mboth + 1) - 1.0
    var = (float((n1 + 1) * (n2 + 1))
           * float((n1 - mboth) * (n2 - mboth))
           / (float((mboth + 1) * (mboth + 1))
              * float(mboth + 2)))
    return pd.DataFrame({
        "n_first": np.array([n1], np.int64),
        "n_second": np.array([n2], np.int64),
        "n_both": np.array([mboth], np.int64),
        "n_hat": [nhat], "var_hat": [var]})


def effect_sizes(
    ds: ray.data.Dataset,
    type_col: str = "event_type",
    val_col: str = "value",
    type_x: str = "click",
    type_y: str = "view",
) -> pd.DataFrame:
    """Standardized effect sizes between the two samples: Cohen's
    d (pooled-SD mean gap), Hedges' g (d times the small-sample
    correction 1 − 3/(4·df − 1)) and Cliff's δ (the ordinal
    P(Y>X) − P(Y<X)) — the magnitude companions the test ladder
    (welch/yuen/brunner_munzel) reports significance for;
    "significant but δ=0.02" is a shippable non-result.

    Moments and the doubled-placement pair counts are exact
    int64/Python-int over the shared histogram; d, g and δ are
    mirrored float closings (δ's numerator 2·#{y>x} − … is exact
    before its single /2nm division)."""
    hist = _two_sample_hist(ds, type_col, val_col, type_x, type_y)
    cols = {"n_x": pd.Series(dtype="int64"),
            "n_y": pd.Series(dtype="int64"),
            "cohens_d": pd.Series(dtype="float64"),
            "hedges_g": pd.Series(dtype="float64"),
            "cliffs_delta": pd.Series(dtype="float64")}
    if len(hist) == 0:
        return pd.DataFrame(cols)
    k = hist["k"].to_numpy(np.int64)
    cx = hist["cx"].to_numpy(np.int64)
    cy = hist["cy"].to_numpy(np.int64)
    n, m = int(cx.sum()), int(cy.sum())
    if n < 2 or m < 2:
        return pd.DataFrame(cols)
    sx = int((k * cx).sum())
    sy = int((k * cy).sum())
    qx = sum(int(kk) * int(kk) * int(c) for kk, c in zip(k, cx))
    qy = sum(int(kk) * int(kk) * int(c) for kk, c in zip(k, cy))
    # pooled variance: ((n−1)s²x + (m−1)s²y)/(n+m−2) with
    # (n−1)s² = Q − S²/n kept in the mirrored float form
    ssx = float(qx) - float(sx) * float(sx) / float(n)
    ssy = float(qy) - float(sy) * float(sy) / float(m)
    sp2 = (ssx + ssy) / float(n + m - 2)
    if sp2 <= 0.0:
        return pd.DataFrame(cols)
    d = (float(sx) / float(n) - float(sy) / float(m)) \
        / np.sqrt(sp2)
    g = d * (1.0 - 3.0 / (4.0 * float(n + m - 2) - 1.0))
    # Cliff's delta from exact pair counts: doubled placement
    # Σcy·p2y = 2·#{x<y} + #ties ⇒ numerator 2(#{x<y} − #{x>y})
    # = 2·Py − 2·nm + 2·Px′ … simplest exact: count directly
    cylt = 0
    lt = gt = 0          # #{pairs y<x}, #{pairs y>x}
    for fx, fy in zip(cx, cy):
        lt += int(fx) * cylt
        cylt += int(fy)
    cxlt = 0
    for fx, fy in zip(cx, cy):
        gt += int(fy) * cxlt
        cxlt += int(fx)
    delta = float(gt - lt) / (float(n) * float(m))
    return pd.DataFrame({
        "n_x": np.array([n], np.int64),
        "n_y": np.array([m], np.int64),
        "cohens_d": [d], "hedges_g": [g],
        "cliffs_delta": [delta]})


def risk_ratios(
    ds: ray.data.Dataset,
    key: str = "user_id",
    type_col: str = "event_type",
    convert_type: str = "purchase",
    baseline_type: str = "error",
) -> pd.DataFrame:
    """Odds ratio and relative risk with 95 % log-scale intervals
    for the even/odd-cohort 2×2 success table (same flag as
    two_proportion) — the epidemiological effect pair: RR for
    "how many times likelier", OR for case-control symmetry, both
    with the standard ln ± 1.96·SE intervals.

    The 2×2 cells are exact int64; OR/RR and the four interval
    bounds are mirrored exp/ln float closings."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        t = df[type_col].to_numpy(object)
        g = pd.DataFrame({key: df[key].to_numpy(),
                          "p": (t == convert_type)
                          .astype(np.int64),
                          "e": (t == baseline_type)
                          .astype(np.int64)})
        return g.groupby(key, as_index=False)[["p", "e"]].sum()

    agg = ds.select_columns([key, type_col]).map_batches(
        partial, batch_format="pandas").to_pandas() \
        .groupby(key, as_index=False)[["p", "e"]].sum()
    cols = {"a": pd.Series(dtype="int64"),
            "b": pd.Series(dtype="int64"),
            "c": pd.Series(dtype="int64"),
            "d": pd.Series(dtype="int64"),
            "odds_ratio": pd.Series(dtype="float64"),
            "or_lo": pd.Series(dtype="float64"),
            "or_hi": pd.Series(dtype="float64"),
            "rel_risk": pd.Series(dtype="float64"),
            "rr_lo": pd.Series(dtype="float64"),
            "rr_hi": pd.Series(dtype="float64")}
    if agg.empty:
        return pd.DataFrame(cols)
    even = (agg[key].to_numpy(np.int64) % 2) == 0
    succ = agg["p"].to_numpy(np.int64) > agg["e"].to_numpy(np.int64)
    a = int((even & succ).sum())       # exposed (even) success
    b = int((even & ~succ).sum())
    c = int((~even & succ).sum())
    d = int((~even & ~succ).sum())
    if min(a, b, c, d) == 0:
        return pd.DataFrame(cols)
    orr = (float(a) * float(d)) / (float(b) * float(c))
    se_or = np.sqrt(1.0 / float(a) + 1.0 / float(b)
                    + 1.0 / float(c) + 1.0 / float(d))
    rr = (float(a) / float(a + b)) / (float(c) / float(c + d))
    se_rr = np.sqrt(1.0 / float(a) - 1.0 / float(a + b)
                    + 1.0 / float(c) - 1.0 / float(c + d))
    return pd.DataFrame({
        "a": np.array([a], np.int64),
        "b": np.array([b], np.int64),
        "c": np.array([c], np.int64),
        "d": np.array([d], np.int64),
        "odds_ratio": [orr],
        "or_lo": [float(np.exp(np.log(orr) - 1.96 * se_or))],
        "or_hi": [float(np.exp(np.log(orr) + 1.96 * se_or))],
        "rel_risk": [rr],
        "rr_lo": [float(np.exp(np.log(rr) - 1.96 * se_rr))],
        "rr_hi": [float(np.exp(np.log(rr) + 1.96 * se_rr))]})


def logrank_test(
    ds: ray.data.Dataset,
    key: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    start_type: str = "signup",
    event_type: str = "purchase",
    num_partitions: int = 16,
) -> pd.DataFrame:
    """Log-rank (Mantel–Cox) test between the even/odd cohorts'
    censored time-to-conversion — the equal-weighted survival
    comparison next to gehan_wilcoxon (which weights early times
    by n at risk): O−E and the hypergeometric variance accumulate
    over event times.

    Durations/censoring are kaplan_meier's cells; at each distinct
    event time the at-risk and death counts per cohort are exact
    ints from cumulative tails, and the float E/V terms accumulate
    in ascending event-time order (the ordered-prefix device) —
    z = (O−E)/√V closes."""
    from .partition import group_apply

    def per_key(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for uid, g in df.groupby(key, observed=True):
            tus = g[ts_col].to_numpy("datetime64[us]").view(np.int64)
            et = g[type_col].to_numpy()
            st = tus[et == start_type]
            if not len(st):
                out.append((int(uid), -1, -1, int(tus.max())))
                continue
            t0 = int(st.min())
            ev = tus[(et == event_type) & (tus > t0)]
            out.append((int(uid), t0,
                        int(ev.min()) if len(ev) else -1,
                        int(tus.max())))
        return pd.DataFrame(out, columns=[key, "t0", "tp", "tmax"])

    cells = group_apply(
        ds.select_columns([key, type_col, ts_col]),
        per_key, num_partitions=num_partitions, key=key,
    ).to_pandas()
    cols = {"n_a": pd.Series(dtype="int64"),
            "n_b": pd.Series(dtype="int64"),
            "o_minus_e": pd.Series(dtype="float64"),
            "z_stat": pd.Series(dtype="float64")}
    if not len(cells):
        return pd.DataFrame(cols)
    tmax = int(cells["tmax"].max())
    cells = cells[cells["t0"] >= 0]
    if not len(cells):
        return pd.DataFrame(cols)
    obs = cells["tp"].to_numpy(np.int64) >= 0
    dur = np.where(obs, cells["tp"].to_numpy(np.int64),
                   tmax) - cells["t0"].to_numpy(np.int64)
    grp_a = (cells[key].to_numpy(np.int64) % 2) == 0
    na, nb = int(grp_a.sum()), int((~grp_a).sum())
    if na == 0 or nb == 0:
        return pd.DataFrame(cols)
    evt_times = np.unique(dur[obs])
    if not len(evt_times):
        return pd.DataFrame(cols)
    ome = 0.0
    var = 0.0
    for t in evt_times:
        at = dur >= t
        n_t = int(at.sum())
        n1 = int((at & grp_a).sum())
        dmask = obs & (dur == t)
        d_t = int(dmask.sum())
        d1 = int((dmask & grp_a).sum())
        if n_t < 2:
            continue
        e1 = float(n1) * float(d_t) / float(n_t)
        v1 = (float(n1) * float(n_t - n1) * float(d_t)
              * float(n_t - d_t)
              / (float(n_t) * float(n_t) * float(n_t - 1)))
        ome = ome + (float(d1) - e1)
        var = var + v1
    if var <= 0.0:
        return pd.DataFrame(cols)
    return pd.DataFrame({
        "n_a": np.array([na], np.int64),
        "n_b": np.array([nb], np.int64),
        "o_minus_e": [ome],
        "z_stat": [ome / float(np.sqrt(var))]})
