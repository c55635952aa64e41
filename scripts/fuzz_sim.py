"""Differential fuzz harness: generate a seeded synthetic dataset with
ADVERSARIAL properties the fixed testdata never exercises — timestamp
ties, duplicate rows, hot keys, exact-duplicate and one-edit texts,
boundary-length documents, stopword-bearing vocab, negative balances —
and run the ENTIRE registry through the driver-identical DuckDB
comparison against it (driver_sim with SPARK_GRAFT_SIM_FUZZ dir).

Every divergence is one of two real findings: a portability bug in a
query/oracle pair (an engine-dependent tie-break, rounding, or NULL
path the fixed corpus happened to dodge — the round-6 stopword-drift
bug was exactly this class), or an undeclared data-contract assumption
that should be documented. Both are worth a round's attention.

Usage:
    python scripts/fuzz_sim.py            # seed 1, all queries
    python scripts/fuzz_sim.py 7          # another seed
    FUZZ_KEEP=1 python scripts/fuzz_sim.py  # keep the generated dir
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["MACHINERY", "AUTOMOBILE", "HOUSEHOLD", "BUILDING", "FURNITURE"]
PTYPES = ["ECONOMY", "MEDIUM", "SMALL", "PROMO", "LARGE", "STANDARD"]
STATUSES = ["F", "P", "O"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
RETFLAGS = ["A", "N", "R"]
LINESTATUS = ["F", "O"]
ETYPES = ["signup", "click", "purchase", "error", "view"]
LANGS = ["en", "en", "en", "fr", "de", "es", "zh"]  # en-heavy like the corpus
# vocab deliberately includes EVERY stopword list's words plus the
# near-miss words ('to','in','is','it') that exposed the funnel drift
VOCAB = (
    "the a of and el la de los der die das und to in is it "
    "spark window merge table scan join hash sort batch stream key value "
    "row part order customer line agg filter group vector slow fast big small dup"
).split()

N_CUST = 60
N_SUPP = 8
N_PART = 100
N_ORDERS = 400
N_EVENTS = 600
N_DOCS = 200
N_EMB = 300
EMB_DIM = 64

DAY_US = 86_400_000_000


def _money(rng, n, lo=1.0, hi=100_000.0):
    return np.round(rng.uniform(lo, hi, n), 2)


def generate(seed: int, out: str) -> None:
    rng = np.random.default_rng(seed)
    os.makedirs(out, exist_ok=True)

    def w(name, table):
        pq.write_table(table, os.path.join(out, f"{name}.parquet"))

    w("region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS,
    }))
    w("nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))
    w("supplier", pa.table({
        "s_suppkey": pa.array(range(N_SUPP), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(N_SUPP)],
        "s_nationkey": pa.array(rng.integers(0, 25, N_SUPP), pa.int32()),
        "s_acctbal": _money(rng, N_SUPP, -999.0, 9999.0),
    }))
    # customers: ties in acctbal, negatives, a few exact duplicates of balance
    bal = _money(rng, N_CUST, -999.0, 9999.0)
    bal[5] = bal[4]  # tie
    w("customer", pa.table({
        "c_custkey": pa.array(range(N_CUST), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(N_CUST)],
        "c_nationkey": pa.array(rng.integers(0, 25, N_CUST), pa.int32()),
        "c_acctbal": bal,
        "c_mktsegment": [SEGMENTS[i] for i in rng.integers(0, 5, N_CUST)],
    }))
    # parts: duplicate names (ER/fuzzy food), many tiny sizes (triangle subgraph)
    adjs = ["cold", "small", "large", "red", "dim", "hot"]
    nouns = ["widget", "bolt", "gear", "cog", "pin"]
    pname = [f"{adjs[rng.integers(0, 6)]} {nouns[rng.integers(0, 5)]}" for _ in range(N_PART)]
    w("part", pa.table({
        "p_partkey": pa.array(range(N_PART), pa.int64()),
        "p_name": pname,
        "p_brand": [f"Brand#{1 + int(i)}" for i in rng.integers(0, 25, N_PART)],
        "p_type": [PTYPES[i] for i in rng.integers(0, 6, N_PART)],
        "p_size": pa.array(rng.integers(1, 51, N_PART), pa.int32()),
        "p_retailprice": _money(rng, N_PART, 100.0, 2000.0),
    }))
    # orders: skewed customers (hot key 0), dates clustered so the 1996
    # predicate windows (q6/q14) are non-empty, some dormant customers
    ocust = rng.integers(0, N_CUST - 5, N_ORDERS)  # last 5 customers dormant
    ocust[: N_ORDERS // 10] = 0  # hot customer
    base_1995 = np.datetime64("1995-01-01", "us").astype(np.int64)
    odate = base_1995 + rng.integers(0, 2400, N_ORDERS) * DAY_US
    w("orders", pa.table({
        "o_orderkey": pa.array(range(N_ORDERS), pa.int64()),
        "o_custkey": pa.array(ocust, pa.int64()),
        "o_orderstatus": [STATUSES[i] for i in rng.integers(0, 3, N_ORDERS)],
        "o_totalprice": _money(rng, N_ORDERS, 900.0, 300_000.0),
        "o_orderdate": pa.array(odate, pa.timestamp("us")),
        "o_orderpriority": [PRIORITIES[i] for i in rng.integers(0, 5, N_ORDERS)],
    }))
    # lineitems: 1-7 per order, occasional duplicated (order, part) pairs
    lok, lpk, lsk, lln, lsd = [], [], [], [], []
    for ok in range(N_ORDERS):
        n_lines = int(rng.integers(1, 8))
        parts = rng.integers(0, N_PART, n_lines)
        if n_lines >= 3:
            parts[1] = parts[0]  # duplicate pair: distinct() paths must dedup
        for ln in range(n_lines):
            lok.append(ok)
            lpk.append(int(parts[ln]))
            lsk.append(int(rng.integers(0, N_SUPP)))
            lln.append(ln + 1)
            lsd.append(int(odate[ok]) + int(rng.integers(1, 121)) * DAY_US)
    n_li = len(lok)
    w("lineitem", pa.table({
        "l_orderkey": pa.array(lok, pa.int64()),
        "l_partkey": pa.array(lpk, pa.int64()),
        "l_suppkey": pa.array(lsk, pa.int64()),
        "l_linenumber": pa.array(lln, pa.int32()),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": _money(rng, n_li, 900.0, 100_000.0),
        "l_discount": np.round(rng.integers(0, 11, n_li) * 0.01, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) * 0.01, 2),
        "l_returnflag": [RETFLAGS[i] for i in rng.integers(0, 3, n_li)],
        "l_linestatus": [LINESTATUS[i] for i in rng.integers(0, 2, n_li)],
        "l_shipdate": pa.array(np.array(lsd, np.int64), pa.timestamp("us")),
    }))
    # events: Jan-2024 span (the documented contract), timestamp TIES with
    # distinct event_ids, duplicate (user, type) pairs, a hot user
    base_ev = np.datetime64("2024-01-01", "us").astype(np.int64)
    ets = base_ev + rng.integers(0, 30 * DAY_US, N_EVENTS)
    ets[10] = ets[11] = ets[12]  # three-way exact tie
    # session-gap BOUNDARY ties (r9): one user's events spaced exactly at,
    # one microsecond under, and one microsecond over the 30-min gap.
    # Both the batch operator (events_sessionize) and Spark's native /
    # streaming session_window start a NEW session only on gap STRICTLY >
    # threshold (an event landing exactly at the boundary merges into the
    # open session) — the corrected SESSION_WINDOW_ORACLE encodes the same
    # strict inequality, and this chain pins all of them cross-engine
    # exactly at the boundary, where the fixed corpus never lands.
    GAP_US = 1_800_000_000
    t0 = base_ev + 5 * DAY_US
    ets[20] = t0
    ets[21] = t0 + GAP_US          # exactly at the gap
    ets[22] = ets[21] + GAP_US - 1  # one us under
    ets[23] = ets[22] + GAP_US + 1  # one us over
    ets[24] = ets[23] + GAP_US      # exactly at, again (chained boundary)
    users = rng.integers(0, 15, N_EVENTS)
    users[: N_EVENTS // 8] = 3  # hot user
    users[20:25] = 13  # the gap-boundary chain belongs to one quiet user
    etypes = [ETYPES[i] for i in rng.integers(0, 5, N_EVENTS)]
    # FUNNEL conversion-window boundary chains (r13): users 16/17 exist
    # ONLY through these planted events (random users stop at 14), so
    # the funnel rows' <= window gate is DECISIVE for them on every
    # seed. User 16: view -> click exactly AT view+24h (included, stage
    # 2) -> purchase one us PAST click+24h (excluded — no stage 3, and
    # no revive). User 17: view -> click one us past the window
    # (excluded, stage stays 1). Exercised by funnel_stage_progression
    # (codegen fold), streaming_funnel_executed (stateful Python fold),
    # and the DuckDB min-struct oracle — all three must agree exactly
    # at the boundary, where the fixed corpus never lands.
    t1 = base_ev + 2 * DAY_US
    ets[25], users[25], etypes[25] = t1, 16, ETYPES[4]  # view
    ets[26], users[26], etypes[26] = t1 + DAY_US, 16, ETYPES[1]  # click, at window
    ets[27], users[27], etypes[27] = t1 + 2 * DAY_US + 1, 16, ETYPES[2]  # purchase, 1us past
    t2 = base_ev + 9 * DAY_US
    ets[28], users[28], etypes[28] = t2, 17, ETYPES[4]  # view
    ets[29], users[29], etypes[29] = t2 + DAY_US + 1, 17, ETYPES[1]  # click, 1us past
    # CDC schema-evolution cutoff boundary (r14): users 18/19 exist ONLY
    # through these events, so cdc_schema_evolution_merge's >= cutoff
    # gate (2024-01-16 00:00:00 = base + 15 days) is DECISIVE for them
    # on every seed. User 18's latest row lands exactly AT the cutoff
    # (channel = event_type); user 19's latest is 1 us BEFORE it
    # (channel NULL), with a same-ts event_id tie under it so the
    # (ts, event_id, value) latest-pick total order is exercised at the
    # boundary too. The cutoff instant is also an exact hour boundary,
    # pinning the split hourly agg's window-edge assignment.
    evo = base_ev + 15 * DAY_US
    ets[30], users[30], etypes[30] = evo - 1, 18, ETYPES[0]
    ets[31], users[31], etypes[31] = evo, 18, ETYPES[1]  # latest, AT cutoff
    ets[32], users[32], etypes[32] = evo - 1, 19, ETYPES[3]  # latest, 1us before
    ets[33], users[33], etypes[33] = evo - 1, 19, ETYPES[0]  # same-ts tie
    # Stream-stream join batch-cut + horizon boundaries (r14): user 20's
    # view->purchase pair STRADDLES the 2024-01-15 day-file cut of the
    # multi-batch drains (the view's state must survive the micro-batch
    # boundary to match a purchase arriving in the next batch); user
    # 21's purchases land exactly AT view+1h (included, <= gate) and
    # 1 us PAST it (excluded) — decisive for the interval join's
    # horizon on every seed, streamed and batch alike.
    cut = base_ev + 14 * DAY_US  # the _UPSERT_SPLIT_DAYS mid boundary
    ets[34], users[34], etypes[34] = cut - 1_800_000_000, 20, ETYPES[4]
    ets[35], users[35], etypes[35] = cut + 900_000_000, 20, ETYPES[2]
    t3 = base_ev + 20 * DAY_US + 3 * 3_600_000_000
    ets[36], users[36], etypes[36] = t3, 21, ETYPES[4]
    ets[37], users[37], etypes[37] = t3 + 3_600_000_000, 21, ETYPES[2]
    ets[38], users[38], etypes[38] = t3 + 3_600_000_001, 21, ETYPES[2]
    # Snapshot time-travel cut boundary (r15): user 22 exists ONLY
    # through these events, so snapshot_time_travel_compacted's
    # version-chain cut (_SNAP_TT_CUT = 2024-01-16, the same instant as
    # the CDC evo boundary) is DECISIVE for them: their v_first latest
    # is a 1-us-before-cut row UNDER a same-ts event_id tie (the
    # (ts DESC, event_id DESC) total order must pick the higher id at
    # the pinned version), and a row exactly AT the cut becomes their
    # overall latest — so v_first and latest DIFFER for user 22 on
    # every seed, across two independently compacted version dirs.
    ets[39], users[39], etypes[39] = evo - 1, 22, ETYPES[0]
    ets[40], users[40], etypes[40] = evo - 1, 22, ETYPES[4]  # same-ts tie
    ets[41], users[41], etypes[41] = evo, 22, ETYPES[2]  # latest, AT cut
    # Compaction-sink overlap boundaries (r15): the
    # streaming_compaction_sink_executed chunks split the 2024-01-14..16
    # overlap window by event_id PARITY — indices are event_ids, so 42
    # (even -> batch one) and 43 (odd -> batch two) land at the SAME
    # first instant of the overlap window: day=2024-01-14 is written by
    # BOTH micro-batches and re-compacted by the second (the keeps-pace
    # overlap guaranteed on every seed). The window is DATE-inclusive
    # of 2024-01-16 (d <= hi), so its true last microsecond is
    # 2024-01-16 23:59:59.999999 — event 44 sits exactly there (even ->
    # still parity-routed to batch one); 45 is one us later, the first
    # instant PAST the inclusive window (2024-01-17 00:00:00, routed to
    # batch two by date, not parity) — the day-boundary routing class.
    # (r16 fix: these two previously sat at `evo` = day 16's FIRST
    # instant, inside the window, so the past-window class never ran.)
    cut_lo = base_ev + 13 * DAY_US  # 2024-01-14 00:00:00
    win_end = base_ev + 17 * DAY_US  # 2024-01-17 00:00:00, first us past
    ets[42], users[42], etypes[42] = cut_lo, 23, ETYPES[1]
    ets[43], users[43], etypes[43] = cut_lo, 23, ETYPES[3]
    ets[44], users[44], etypes[44] = win_end - 1, 23, ETYPES[4]  # last us of window
    ets[45], users[45], etypes[45] = win_end, 23, ETYPES[4]  # first us past
    # Restart-sink boundaries (r16): streaming_compaction_restart_
    # executed routes everything >= 2024-01-21 plus the ODD half of
    # 2024-01-20 to the LATE file that arrives after the first drain
    # completes. 46 (even) and 47 (odd) sit at the overlap day's first
    # instant — the same microsecond splits across the RESTART boundary
    # by parity, so the resumed query re-compacts a day the completed
    # drain already compacted on every seed; 48 (even -> pre-restart)
    # at the overlap day's last microsecond; 49 at cut2's first instant
    # (routed late by DATE — parity is irrelevant past the overlap day).
    # The pruned-scan row needs no planting: event_ids are dense
    # 0..N-1, so rows sit exactly AT its lo/hi bounds (59/179 here) and
    # BETWEEN-inclusivity is exercised on every seed.
    r16_lo = base_ev + 19 * DAY_US  # 2024-01-20 00:00:00
    r16_cut = base_ev + 20 * DAY_US  # 2024-01-21 00:00:00
    ets[46], users[46], etypes[46] = r16_lo, 24, ETYPES[1]
    ets[47], users[47], etypes[47] = r16_lo, 24, ETYPES[3]
    ets[48], users[48], etypes[48] = r16_cut - 1, 24, ETYPES[4]  # last us of 01-20
    ets[49], users[49], etypes[49] = r16_cut, 24, ETYPES[2]  # first us of the cut
    w("events", pa.table({
        "event_id": pa.array(range(N_EVENTS), pa.int64()),
        "ts": pa.array(ets, pa.timestamp("us")),
        "user_id": pa.array(users, pa.int64()),
        "event_type": etypes,
        "value": _money(rng, N_EVENTS, 0.01, 400.0),
        "props": [f'{{"k": {int(k)}}}' for k in rng.integers(0, 100, N_EVENTS)],
    }))
    # documents: exact dups, one-edit near-dups, sub-50-char shorts,
    # stopword-bearing vocab (incl. the drift words)
    texts = []
    for i in range(N_DOCS):
        n_tok = int(rng.integers(3, 60))
        toks = [VOCAB[j] for j in rng.integers(0, len(VOCAB), n_tok)]
        texts.append(" ".join(toks))
    for i in range(0, 20, 2):  # 10 exact duplicate pairs
        texts[i + 1] = texts[i]
    for i in range(20, 40, 2):  # 10 near-dup pairs (one-token edit)
        toks = texts[i].split()
        toks[len(toks) // 2] = "edited"
        texts[i + 1] = " ".join(toks)
    # sequence-packing boundary docs (r9): one source whose token counts
    # land EXACTLY on the PACK_BUDGET_TOKENS=512 chop lines — a doc of
    # exactly the budget, two halves summing to it, one token over, one
    # token, and one under-by-one. start_off // budget vs
    # (start_off + n_tok - 1) // budget disagree between engines only if
    # integer-division or window-ordering semantics drift — exactly at
    # these offsets.
    pack_sizes = [512, 256, 256, 513, 1, 511, 512]
    pack_ids = list(range(40, 40 + len(pack_sizes)))
    for di, n_tok in zip(pack_ids, pack_sizes):
        texts[di] = " ".join(VOCAB[j % len(VOCAB)] for j in range(n_tok))
    # Jaccard EXACTLY at the 0.5 dedup threshold (r13): doc 48's token
    # stream extends doc 47's by exactly (k-2) tokens, so its 3-gram
    # shingle set is a 2x superset — J = 8/16 = 0.5, representable
    # exactly in IEEE, sitting ON the >= 0.5 gate of the prefix-filter
    # join, the n-gram Jaccard row, the LSH verify stage, AND the
    # PPJoin length filter's equality case (2*min == max) + position
    # alpha equality (overlap == ceil((na+nb)/3) == 8). Both engines
    # must include the pair, every seed.
    texts[47] = " ".join(VOCAB[:10])
    texts[48] = " ".join(VOCAB[:18])
    # Bloom delta-merge adversaries (r15): decontaminate_bloom_delta's
    # bench is doc_id % 11 IN (0, 1) — base slice 0, DELTA slice 1.
    # Doc 56 (56 % 11 == 1, delta) carries a distinctive 5-gram that
    # doc 57 (train) shares: 57 is flagged ONLY if the delta slice's
    # words actually merged into the standing filter (it shares nothing
    # with the base slice, so the base-only rows must NOT flag it).
    # Doc 55 (55 % 11 == 0, base) carries phrase B shared by doc 58
    # (train) — flagged by base-only AND delta rows alike. Doc 59
    # (train) STRADDLES: one 5-gram from the base phrase, one from the
    # delta phrase — n_bench_docs must count both slices after the
    # merge. Distinct non-VOCAB tokens keep the planted 5-grams unique.
    phrase_delta = "zebra quill umbra vortex nimbus"
    phrase_base = "gale ember crag fjord talus"
    texts[56] = phrase_delta
    texts[55] = phrase_base
    texts[57] = phrase_delta + " " + " ".join(VOCAB[:4])
    texts[58] = phrase_base + " " + " ".join(VOCAB[4:8])
    texts[59] = phrase_base + " " + phrase_delta
    w("documents", pa.table({
        "doc_id": pa.array(range(N_DOCS), pa.int64()),
        "text": texts,
        "lang": [LANGS[i] for i in rng.integers(0, len(LANGS), N_DOCS)],
        "source": [
            "srcpack" if i in pack_ids else f"src{int(s)}"
            for i, s in enumerate(rng.integers(0, 20, N_DOCS))
        ],
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))
    # embeddings: near-duplicate vectors + exact duplicates; ids cover the
    # fixed QUERY_VEC_ID (0) and CENTROID_IDS (1..8)
    emb = rng.normal(0, 1, (N_EMB, EMB_DIM)).astype(np.float32)
    emb[50] = emb[51]  # exact duplicate vector
    emb[52] = emb[51] + np.float32(1e-3)
    # IVF-cell-layout adversaries (r13): a HOT CELL — twenty vectors
    # collapsed tightly around codebook seed 1 (cluster imbalance: some
    # cells empty after Lloyd, one dominating — the partitioned index
    # must still write/prune correctly with missing cell directories);
    # an EXACT copy of a seed vector (zero distance to its centroid);
    # and a HALF-WAY vector equidistant between seeds 1 and 2 (the
    # rounded-L2 argmin tie must break to the smaller cid on both
    # engines — the davg half-way class, in assignment space).
    for i in range(60, 80):
        emb[i] = emb[1] + rng.normal(0, 1e-3, EMB_DIM).astype(np.float32)
    emb[80] = emb[1]
    emb[81] = ((emb[1].astype(np.float64) + emb[2].astype(np.float64)) / 2).astype(
        np.float32
    )
    # IVF delta-append adversary (r14): a DELTA-slice vector (13 % 5 == 3)
    # that exactly duplicates a BASE vector — after the append both live
    # in the same cell with identical cosines to any query, so the
    # probe's (cosine DESC, vec_id) tie-break is decisive across the
    # base/delta file boundary on every seed. The hot cell above already
    # contains delta ids (63/68/73/78), stressing appends into a
    # dominating cell and cells created by the append alone.
    # (r15: vec 13 is ALSO ann_ivf_cell_compaction's query vector — the
    # compacted-index probe's top-1 is this exact base duplicate at
    # cosine 1.0, so the (cosine DESC, vec_id) tie-break crosses a
    # freshly COMPACTED file boundary on every seed, and the hot cell's
    # base+delta fragmentation guarantees the compaction pass always
    # has multi-file cells to merge.)
    emb[13] = emb[12]
    w("embeddings", pa.table({
        "vec_id": pa.array(range(N_EMB), pa.int64()),
        "embedding": pa.array([v.tolist() for v in emb], pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, N_EMB), pa.int32()),
    }))


def main() -> int:
    seed = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    out = os.path.join(tempfile.gettempdir(), f"spark_graft_fuzz_seed{seed}")
    generate(seed, out)
    print(f"fuzz data (seed {seed}) -> {out}; running driver_sim ...", flush=True)
    env = dict(os.environ, SPARK_GRAFT_SIM_SF=out)
    rc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "driver_sim.py")],
        env=env,
    ).returncode
    if not os.environ.get("FUZZ_KEEP"):
        import shutil

        shutil.rmtree(out, ignore_errors=True)
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
