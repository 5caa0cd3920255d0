#!/usr/bin/env python3
"""Scale-up testdata generator (dev tool — driver-side Python only).

The round driver ships sf0.001/sf0.01/sf0.1 but not sf1, and
/root/testdata is read-only; the VERDICT's 100×-scale validation needs a
10× corpus. This reproduces the driver tables' MEASURED distributional
character (same 31-word vocabulary, doc-length Uniform(10,100), lang mix
en .41 / others .1475, source = src(doc_id % 20), planted exact copies /
~J0.85 near-dups / trimmed containment copies at the observed rates;
10-cluster Gaussian embeddings with the observed within/between variance;
TPC-H-ish relational tables with the observed key ranges, fanouts, and
category mixes) at any requested scale, seeded and deterministic.

Growth ratios are measured SELF-CONSISTENTLY: generate BOTH a 0.1-scale
twin and the 1.0-scale corpus with this generator and compare those two
bench runs, so any generator-vs-driver mismatch cancels out of the ratio.
The 0.1 twin's absolute times vs the driver's sf0.1 anchor the match.

Usage: gen_scale.py OUTDIR SCALE [SEED] [--vocab=zipf]
  SCALE 0.1 -> 5,000 docs / 600k lineitem (the driver's sf0.1 shape)
  SCALE 1   -> 50,000 docs / 6M lineitem

--vocab=zipf (r14, VERDICT r13 item 1): documents draw from a 50,000-type
vocabulary with Zipf(s=1.1) rank frequencies instead of the 31-word
uniform vocab. The two modes bracket the gram-density spectrum: uniform31
saturates the word-3-gram space at sf1 (every gram above any df cap — the
boilerplate-dense extreme BENCH_sf1.json measured), while zipf leaves most
grams rare and PAIRABLE (the realistic middle where the exact containment
tier's candidate volume and the LSH banding FP rate actually bite).
Zipf word draws use a DEDICATED RNG (np.random.default_rng(SEED ^ 1)), so
the shared nprnd stream is untouched and every nprnd-generated table
(embeddings + all relational/events tables) is BIT-identical across
modes. The documents table matches across modes DISTRIBUTIONALLY (same
planted exact/near-dup/containment rates, length law, lang/source mixes)
but not byte-wise beyond the words: per-doc branch/length/lang draws come
from the shared `rnd` stream, which uniform mode consumes per word and
zipf mode does not, so those per-doc draws land differently.
"""
import os
import random
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

args = [a for a in sys.argv[1:] if not a.startswith('--')]
OUT = args[0]
SCALE = float(args[1])
SEED = int(args[2]) if len(args) > 2 else 42
ZIPF = any(a == '--vocab=zipf' for a in sys.argv[1:])
os.makedirs(OUT, exist_ok=True)
rnd = random.Random(SEED)
nprnd = np.random.default_rng(SEED)

VOCAB = ['a', 'agg', 'batch', 'big', 'column', 'customer', 'data', 'dup',
         'fast', 'filter', 'group', 'hash', 'join', 'key', 'line', 'merge',
         'order', 'part', 'query', 'row', 'scan', 'slow', 'small', 'sort',
         'spark', 'stream', 'table', 'the', 'value', 'vector', 'window']

if ZIPF:
    N_TYPES, ZIPF_S = 50000, 1.1
    zipf_words = [f'z{r}' for r in range(N_TYPES)]
    probs = np.arange(1, N_TYPES + 1, dtype=np.float64) ** (-ZIPF_S)
    probs /= probs.sum()
    zipf_cdf = np.cumsum(probs)

    # dedicated stream: word draws must not shift nprnd, or every later
    # nprnd-generated table (embeddings, customer, orders, lineitem,
    # events) would diverge byte-wise from uniform mode
    zrnd = np.random.default_rng(SEED ^ 1)

    def draw_words(k):
        """k Zipf-sampled word strings (inverse-CDF via searchsorted)."""
        u = zrnd.random(k)
        return [zipf_words[i] for i in np.searchsorted(zipf_cdf, u)]
else:
    def draw_words(k):
        return [rnd.choice(VOCAB) for _ in range(k)]
LANGS = ['en', 'de', 'es', 'fr', 'zh']
LANG_W = [0.41, 0.1475, 0.1475, 0.1475, 0.1475]


def write(name, cols, schema=None):
    t = pa.table(cols, schema=schema)
    pq.write_table(t, os.path.join(OUT, name + '.parquet'))
    print(f"[gen] {name}: {t.num_rows} rows")


# ---- documents ----
n_docs = int(round(50000 * SCALE))
texts, langs = [], []
for i in range(n_docs):
    r = rnd.random()
    if i > 10 and r < 0.003:          # exact copy (8/5000 observed)
        texts.append(texts[rnd.randrange(i)])
    elif i > 10 and r < 0.023:        # near-dup: ~7% word substitutions
        ws = texts[rnd.randrange(i)].split()
        ws = [draw_words(1)[0] if rnd.random() < 0.07 else w for w in ws]
        texts.append(' '.join(ws))
    elif i > 10 and r < 0.073:        # containment: trim or wrap (25/500)
        ws = texts[rnd.randrange(i)].split()
        if rnd.random() < 0.5 and len(ws) > 12:
            k = rnd.randrange(1, max(2, len(ws) // 10))
            ws = ws[k:] if rnd.random() < 0.5 else ws[:-k]
        else:
            pre = draw_words(rnd.randrange(1, 4))
            suf = draw_words(rnd.randrange(1, 4))
            ws = pre + ws + suf
        texts.append(' '.join(ws))
    else:                             # fresh iid doc
        L = rnd.randint(10, 100)
        texts.append(' '.join(draw_words(L)))
    langs.append(rnd.choices(LANGS, weights=LANG_W)[0])
write('documents', {
    'doc_id': pa.array(range(n_docs), pa.int64()),
    'text': pa.array(texts, pa.string()),
    'lang': pa.array(langs, pa.string()),
    'source': pa.array([f'src{i % 20}' for i in range(n_docs)], pa.string()),
    'n_chars': pa.array([len(t) for t in texts], pa.int64()),
})

# ---- embeddings: 10 Gaussian clusters in 64d (observed: per-dim std
# ~0.123 overall, max cross-point cosine ~0.5) ----
n_vec = int(round(20000 * SCALE))
dim, k = 64, 10
centers = nprnd.normal(0.0, 0.09, size=(k, dim))
labels = nprnd.integers(0, k, size=n_vec)
emb = centers[labels] + nprnd.normal(0.0, 0.09, size=(n_vec, dim))
write('embeddings', {
    'vec_id': pa.array(range(n_vec), pa.int64()),
    'embedding': pa.array([row.astype(np.float32) for row in emb],
                          pa.list_(pa.float32())),
    'label': pa.array(labels.astype(np.int32), pa.int32()),
})

# ---- relational ----
n_cust = int(round(150000 * SCALE))
n_ord = int(round(1500000 * SCALE))
n_supp = int(round(10000 * SCALE))
n_part = int(round(200000 * SCALE))
SEGS = ['AUTOMOBILE', 'BUILDING', 'FURNITURE', 'HOUSEHOLD', 'MACHINERY']
write('customer', {
    'c_custkey': pa.array(range(n_cust), pa.int64()),
    'c_name': pa.array([f'Customer#{i:09d}' for i in range(n_cust)]),
    'c_nationkey': pa.array(nprnd.integers(0, 25, n_cust).astype(np.int32),
                            pa.int32()),
    'c_acctbal': pa.array(np.round(nprnd.uniform(-1000, 10000, n_cust), 2)),
    'c_mktsegment': pa.array([SEGS[i] for i in nprnd.integers(0, 5, n_cust)]),
})
day_ms = 86400_000_000  # microseconds per day
d0 = np.datetime64('1995-01-01', 'us')
odate_days = nprnd.integers(0, 2405, n_ord)
odates = d0 + odate_days * np.timedelta64(1, 'D')
write('orders', {
    'o_orderkey': pa.array(range(n_ord), pa.int64()),
    'o_custkey': pa.array(nprnd.integers(0, n_cust, n_ord), pa.int64()),
    'o_orderstatus': pa.array([['O', 'P', 'F'][i]
                               for i in nprnd.integers(0, 3, n_ord)]),
    'o_totalprice': pa.array(np.round(nprnd.uniform(900, 450000, n_ord), 2)),
    'o_orderdate': pa.array(odates, pa.timestamp('us')),
    'o_orderpriority': pa.array(
        [['1-URGENT', '2-HIGH', '3-MEDIUM', '4-NOT SPECIFIED', '5-LOW'][i]
         for i in nprnd.integers(0, 5, n_ord)]),
})
# lineitem: 1..7 lines per order, mean ~4 (observed 4.075)
lines_per = nprnd.integers(1, 8, n_ord)
lkeys = np.repeat(np.arange(n_ord, dtype=np.int64), lines_per)
n_li = len(lkeys)
lnum = np.concatenate([np.arange(1, c + 1) for c in lines_per]).astype(np.int32)
ship = odates[lkeys] + nprnd.integers(1, 95, n_li) * np.timedelta64(1, 'D')
RF = ['N', 'A', 'R']
LS = ['O', 'F']
write('lineitem', {
    'l_orderkey': pa.array(lkeys, pa.int64()),
    'l_partkey': pa.array(nprnd.integers(0, n_part, n_li), pa.int64()),
    'l_suppkey': pa.array(nprnd.integers(0, n_supp, n_li), pa.int64()),
    'l_linenumber': pa.array(lnum, pa.int32()),
    'l_quantity': pa.array(nprnd.integers(1, 51, n_li).astype(np.float64)),
    'l_extendedprice': pa.array(np.round(nprnd.uniform(900, 100000, n_li), 2)),
    'l_discount': pa.array(np.round(nprnd.uniform(0, 0.1, n_li), 2)),
    'l_tax': pa.array(np.round(nprnd.uniform(0, 0.08, n_li), 2)),
    'l_returnflag': pa.array([RF[i] for i in nprnd.integers(0, 3, n_li)]),
    'l_linestatus': pa.array([LS[i] for i in nprnd.integers(0, 2, n_li)]),
    'l_shipdate': pa.array(ship, pa.timestamp('us')),
})
write('supplier', {
    's_suppkey': pa.array(range(n_supp), pa.int64()),
    's_name': pa.array([f'Supplier#{i:09d}' for i in range(n_supp)]),
    's_nationkey': pa.array(nprnd.integers(0, 25, n_supp).astype(np.int32),
                            pa.int32()),
    's_acctbal': pa.array(np.round(nprnd.uniform(-1000, 10000, n_supp), 2)),
})
ADJ = ['large', 'hot', 'blue', 'green', 'small', 'dark', 'light', 'red']
NOUN = ['ring', 'bolt', 'case', 'drum', 'gear', 'disk', 'tube', 'cap']
PTYPE = ['LARGE', 'ECONOMY', 'SMALL', 'STANDARD', 'PROMO', 'MEDIUM']
write('part', {
    'p_partkey': pa.array(range(n_part), pa.int64()),
    'p_name': pa.array([f'{ADJ[i % 8]} {NOUN[(i // 8) % 8]}'
                        for i in range(n_part)]),
    'p_brand': pa.array([f'Brand#{(i * 7) % 25}' for i in range(n_part)]),
    'p_type': pa.array([PTYPE[i % 6] for i in range(n_part)]),
    'p_size': pa.array(nprnd.integers(1, 51, n_part).astype(np.int32),
                       pa.int32()),
    'p_retailprice': pa.array([round(900 + (i % 1000) / 10.0, 2)
                               for i in range(n_part)]),
})
write('nation', {
    'n_nationkey': pa.array(range(25), pa.int32()),
    'n_name': pa.array([f'NATION_{i}' for i in range(25)]),
    'n_regionkey': pa.array([i % 5 for i in range(25)], pa.int32()),
})
write('region', {
    'r_regionkey': pa.array(range(5), pa.int32()),
    'r_name': pa.array(['AFRICA', 'AMERICA', 'ASIA', 'EUROPE', 'MIDDLE EAST']),
})

# ---- events: the append-ordered stream table (observed at driver sf0.1:
# 100k events over 30 days, ts uniform and SORTED by event_id — an
# append-time log; 5 uniform event types; value ~ Exponential(mean 50)
# rounded to cents; user_id uniform over ~15k users per unit scale;
# props = single-key JSON with k uniform 0..99). Generated LAST so the
# other tables' RNG draws — and therefore their bytes — are unchanged
# from the r13 artifacts. ----
n_ev = int(round(1000000 * SCALE))
n_users = max(int(round(15000 * SCALE)), 1)
e0 = np.datetime64('2024-01-01', 'us')
ev_ts = e0 + np.sort(
    nprnd.integers(0, 30 * 86400_000_000, n_ev, dtype=np.int64)
) * np.timedelta64(1, 'us')
ETYPES = ['signup', 'purchase', 'view', 'click', 'error']
write('events', {
    'event_id': pa.array(range(n_ev), pa.int64()),
    'ts': pa.array(ev_ts, pa.timestamp('us')),
    'user_id': pa.array(nprnd.integers(0, n_users, n_ev), pa.int64()),
    'event_type': pa.array([ETYPES[i] for i in nprnd.integers(0, 5, n_ev)]),
    'value': pa.array(np.round(nprnd.exponential(50.0, n_ev), 2)),
    'props': pa.array([f'{{"k": {k}}}' for k in nprnd.integers(0, 100, n_ev)]),
})
print(f"[gen] done -> {OUT} (scale {SCALE}, seed {SEED})")
