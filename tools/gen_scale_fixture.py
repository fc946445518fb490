#!/usr/bin/env python3
"""Generate a scaled-up fixture with the SAME schema and distributional
shape as the driver's synthetic testdata (TESTDATA.md), for the r16
empirical scaling-exponent measurement (judge ask #2).

The point is NOT to reproduce the driver's data bit-for-bit — it is to
produce a corpus N x the rows of sf0.1 with the same value domains,
key-fanout ratios, document vocabulary/length mix, and dup rates, so
that time(Nx)/time(1x) per query is a meaningful scaling exponent.
Never writes into /root/testdata (read-only per TESTDATA.md).

Usage: python3 tools/gen_scale_fixture.py <sf> <outdir> [--zipf-items A]
  sf=1.0 produces 10x the sf0.1 row counts (the TESTDATA convention:
  lineitem rows = 6,000,000 * sf).

  --zipf-items A (r16 judge ask #5: the 10x fixture was UNSKEWED, so
  the CF hot-item cap never bound and the capped regime stayed
  property-tested rather than scale-measured): draw lineitem's
  l_partkey from a bounded Zipf over the part catalog with exponent A
  (popularity of rank-k item ∝ k^-A; item id = rank-1, so partkey 0 is
  the hottest) instead of uniform. Everything else — schemas, row
  counts, every other column — is identical, so capped-vs-uncapped CF
  walls at 1x/10x isolate exactly the skew containment. A ≈ 0.6-0.8
  makes the hottest items exceed the default 10,000-user cap at 10x
  while keeping the uncapped pair explosion finite enough to measure.
"""
import sys, os
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
EPOCH_95 = np.datetime64("1995-01-01")
VOCAB = np.array([
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window"])
SEGMENTS = np.array(["AUTOMOBILE", "HOUSEHOLD", "BUILDING", "FURNITURE",
                     "MACHINERY"])
PTYPES = np.array(["ECONOMY", "LARGE", "STANDARD", "MEDIUM", "SMALL",
                   "PROMO"])
PRIORITIES = np.array(["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
                       "5-LOW"])
LANGS = np.array(["en", "zh", "fr", "es", "de"])
LANGP = np.array([0.41, 0.1475, 0.1475, 0.1475, 0.1475])


def write(out, name, table):
    path = os.path.join(out, f"{name}.parquet")
    pq.write_table(table, path)
    print(f"  {name}: {table.num_rows} rows -> {path}")


def ts_us(days_float):
    return (EPOCH_95 + (days_float * 86400).astype("timedelta64[s]")) \
        .astype("datetime64[us]")


def main():
    sf = float(sys.argv[1])
    out = sys.argv[2]
    zipf_alpha = None
    if "--zipf-items" in sys.argv:
        zipf_alpha = float(sys.argv[sys.argv.index("--zipf-items") + 1])
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(SEED)
    nC = int(150_000 * sf)
    nP = int(200_000 * sf)
    nS = int(10_000 * sf)
    nO = int(1_500_000 * sf)
    nD = int(50_000 * sf)
    nE = int(20_000 * sf)
    span_days = 2404  # 1995-01-01 .. 2001-08-01, matching sf0.1

    # region / nation — fixed tiny dimensions
    write(out, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": [f"REGION{i}" for i in range(5)]}))
    write(out, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32())}))

    write(out, "customer", pa.table({
        "c_custkey": pa.array(np.arange(nC), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(nC)],
        "c_nationkey": pa.array(rng.integers(0, 25, nC), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-999, 9999, nC), 2),
        "c_mktsegment": SEGMENTS[rng.integers(0, 5, nC)]}))

    write(out, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(nS), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(nS)],
        "s_nationkey": pa.array(rng.integers(0, 25, nS), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-999, 9999, nS), 2)}))

    adjectives = ["large", "hot", "blue", "red", "small", "green", "dim",
                  "pale", "dark", "light"]
    nouns = ["ring", "bolt", "cap", "drum", "case", "pin", "tube", "box"]
    write(out, "part", pa.table({
        "p_partkey": pa.array(np.arange(nP), pa.int64()),
        "p_name": [f"{adjectives[i % 10]} {nouns[(i // 10) % 8]}"
                   for i in range(nP)],
        "p_brand": [f"Brand#{1 + i % 25}" for i in range(nP)],
        "p_type": PTYPES[rng.integers(0, 6, nP)],
        "p_size": pa.array(rng.integers(1, 51, nP), pa.int32()),
        "p_retailprice": np.round(900 + np.arange(nP) * 0.1, 2)}))

    odate = rng.uniform(0, span_days, nO)
    write(out, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(nO), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, nC, nO), pa.int64()),
        "o_orderstatus": np.array(["O", "P", "F"])[rng.integers(0, 3, nO)],
        "o_totalprice": np.round(rng.uniform(1000, 500000, nO), 2),
        "o_orderdate": ts_us(np.floor(odate)),
        "o_orderpriority": PRIORITIES[rng.integers(0, 5, nO)]}))

    # lineitem: 1..7 lines per order (mean 4 — the sf0.1 fanout)
    lines = rng.integers(1, 8, nO)
    lok = np.repeat(np.arange(nO), lines)
    nL = lok.size
    ship = np.repeat(odate, lines) + rng.uniform(1, 95, nL)
    if zipf_alpha is not None:
        # bounded Zipf over the catalog: P(item k) ∝ (k+1)^-alpha.
        # np.random's zipf() needs alpha > 1 and has unbounded support;
        # an explicit pmf + choice covers the 0 < alpha <= 1 regime
        # where the head is hot but the tail still carries mass.
        pmf = np.arange(1, nP + 1, dtype=np.float64) ** -zipf_alpha
        pmf /= pmf.sum()
        l_partkey = rng.choice(nP, nL, p=pmf)
        hot = np.bincount(l_partkey[:1_000_000], minlength=1)
        print(f"  zipf-items alpha={zipf_alpha}: hottest item carries "
              f"{hot.max() / min(nL, 1_000_000):.4%} of lines")
    else:
        l_partkey = rng.integers(0, nP, nL)
    write(out, "lineitem", pa.table({
        "l_orderkey": pa.array(lok, pa.int64()),
        "l_partkey": pa.array(l_partkey, pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, nS, nL), pa.int64()),
        "l_linenumber": pa.array(
            np.concatenate([np.arange(1, k + 1) for k in lines])
            if nL else np.array([], dtype=np.int64), pa.int32()),
        "l_quantity": rng.integers(1, 51, nL).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 100000, nL), 2),
        "l_discount": np.round(rng.uniform(0, 0.1, nL), 2),
        "l_tax": np.round(rng.uniform(0, 0.08, nL), 2),
        "l_returnflag": np.array(["N", "A", "R"])[rng.integers(0, 3, nL)],
        "l_linestatus": np.array(["O", "F"])[rng.integers(0, 2, nL)],
        "l_shipdate": ts_us(np.minimum(ship, span_days + 95))}))

    # events: 1,000,000 * sf rows over a 2024 window
    nEv = int(1_000_000 * sf)
    etypes = np.array(["view", "click", "purchase", "error"])
    write(out, "events", pa.table({
        "event_id": pa.array(np.arange(nEv), pa.int64()),
        "ts": (np.datetime64("2024-01-01") +
               (np.sort(rng.uniform(0, 45 * 86400, nEv)) * 1e6)
               .astype("timedelta64[us]")),
        "user_id": pa.array(rng.integers(0, int(2000 * 10 * sf) or 1, nEv),
                            pa.int64()),
        "event_type": etypes[rng.integers(0, 4, nEv)],
        "value": np.round(rng.uniform(0, 200, nEv), 2),
        "props": [f'{{"k": {v}}}' for v in rng.integers(0, 100, nEv)]}))

    # documents: 10..100 words from the 31-word vocabulary, ~0.16% exact
    # dups (sf0.1: 8 dup rows in 5000), lang/source mix as sf0.1
    lens = rng.integers(10, 101, nD)
    texts = []
    for i in range(nD):
        if i % 625 == 624:
            texts.append(texts[i - 1])  # exact duplicate of the previous
        else:
            texts.append(" ".join(VOCAB[rng.integers(0, len(VOCAB),
                                                     lens[i])]))
    write(out, "documents", pa.table({
        "doc_id": pa.array(np.arange(nD), pa.int64()),
        "text": texts,
        "lang": LANGS[rng.choice(5, nD, p=LANGP)],
        "source": [f"src{i % 20}" for i in range(nD)],
        "n_chars": pa.array([len(t) for t in texts], pa.int64())}))

    # embeddings: dim-64 float32, 10 gaussian clusters (labels), values
    # in roughly the sf0.1 range (|x| < ~0.35)
    centers = rng.normal(0, 0.08, (10, 64))
    labels = rng.integers(0, 10, nE)
    vecs = (centers[labels] + rng.normal(0, 0.05, (nE, 64))) \
        .astype(np.float32)
    write(out, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(nE), pa.int64()),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32())}))
    print("done")


if __name__ == "__main__":
    main()
