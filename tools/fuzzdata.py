#!/usr/bin/env python3
"""Generate an adversarial testdata dir with the same schemas as
/root/testdata/sf* but hostile values: negatives, exact rounding
boundaries (x.xx5), zeros, empty/unicode-ish strings, duplicate keys,
ties in sort columns. Used to fuzz the Spark<->DuckDB oracle alignment
beyond the driver's fixed seed=42 data.

Usage: python3 tools/fuzzdata.py /tmp/fuzz-sf [rows_scale] [seed]
"""
import sys, os, random
import pyarrow as pa
import pyarrow.parquet as pq

out = sys.argv[1]
scale = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
os.makedirs(out, exist_ok=True)
rng = random.Random(int(sys.argv[3]) if len(sys.argv) > 3 else 1337)

def nasty_price():
    r = rng.random()
    if r < 0.1: return round(rng.uniform(-1000, 0), 2)      # negatives
    if r < 0.2: return rng.randint(1, 400) * 1000 + 0.005   # half boundary
    if r < 0.3: return float(rng.randint(0, 500000))        # integral
    if r < 0.32: return 0.0
    return round(rng.uniform(0, 500000), 2)

def nasty_word():
    r = rng.random()
    if r < 0.05: return ""
    if r < 0.1: return "the"
    if r < 0.15: return "a"
    if r < 0.2: return rng.choice(["UPPER", "MiXeD", "x'y", 'q"z', "semi;colon"])
    return rng.choice(["spark", "data", "join", "merge", "tok%d" % rng.randint(0, 50)])

N = dict(region=5, nation=25, customer=int(300*scale), supplier=int(20*scale),
         part=int(400*scale), orders=int(3000*scale), lineitem=int(12000*scale),
         events=int(2000*scale), documents=int(100*scale), embeddings=int(100*scale))

pq.write_table(pa.table({
    "r_regionkey": pa.array(range(N["region"]), pa.int32()),
    "r_name": [f"REGION{i}" for i in range(N["region"])]}), f"{out}/region.parquet")

pq.write_table(pa.table({
    "n_nationkey": pa.array(range(N["nation"]), pa.int32()),
    "n_name": [f"NATION{i}" for i in range(N["nation"])],
    "n_regionkey": pa.array([i % N["region"] for i in range(N["nation"])], pa.int32())}),
    f"{out}/nation.parquet")

pq.write_table(pa.table({
    "c_custkey": pa.array(range(N["customer"]), pa.int64()),
    "c_name": [f"Customer#{i:09d}" for i in range(N["customer"])],
    "c_nationkey": pa.array([rng.randrange(N["nation"]) for _ in range(N["customer"])], pa.int32()),
    "c_acctbal": [nasty_price() for _ in range(N["customer"])],
    "c_mktsegment": [rng.choice(["AUTOMOBILE","BUILDING","FURNITURE","HOUSEHOLD","MACHINERY"]) for _ in range(N["customer"])]}),
    f"{out}/customer.parquet")

pq.write_table(pa.table({
    "s_suppkey": pa.array(range(N["supplier"]), pa.int64()),
    "s_name": [f"Supplier#{i}" for i in range(N["supplier"])],
    "s_nationkey": pa.array([rng.randrange(N["nation"]) for _ in range(N["supplier"])], pa.int32()),
    "s_acctbal": [nasty_price() for _ in range(N["supplier"])]}),
    f"{out}/supplier.parquet")

pq.write_table(pa.table({
    "p_partkey": pa.array(range(N["part"]), pa.int64()),
    "p_name": [" ".join(nasty_word() for _ in range(2)) for _ in range(N["part"])],
    "p_brand": [f"Brand#{rng.randrange(1,56)}" for _ in range(N["part"])],
    "p_type": [rng.choice(["ECONOMY","SMALL","STANDARD","LARGE","PROMO"]) for _ in range(N["part"])],
    "p_size": pa.array([rng.randrange(1, 51) for _ in range(N["part"])], pa.int32()),
    "p_retailprice": [nasty_price() for _ in range(N["part"])]}),
    f"{out}/part.parquet")

base_ms = 788918400000  # 1995-01-01
pq.write_table(pa.table({
    "o_orderkey": pa.array(range(N["orders"]), pa.int64()),
    "o_custkey": pa.array([rng.randrange(N["customer"]+20) for _ in range(N["orders"])], pa.int64()),  # some dangling keys
    "o_orderstatus": [rng.choice(["F","O","P"]) for _ in range(N["orders"])],
    "o_totalprice": [nasty_price() for _ in range(N["orders"])],
    "o_orderdate": pa.array([base_ms + rng.randrange(0, 2400) * 86400000 for _ in range(N["orders"])], pa.timestamp("ms")),
    "o_orderpriority": [rng.choice(["1-URGENT","2-HIGH","3-MEDIUM","4-NOT SPECIFIED","5-LOW"]) for _ in range(N["orders"])]}),
    f"{out}/orders.parquet")

# lineitem: duplicate (orderkey,linenumber) ties avoided; qty ties common
pq.write_table(pa.table({
    "l_orderkey": pa.array([i // 4 for i in range(N["lineitem"])], pa.int64()),
    "l_partkey": pa.array([rng.randrange(N["part"]) for _ in range(N["lineitem"])], pa.int64()),
    "l_suppkey": pa.array([rng.randrange(max(1, N["supplier"])) for _ in range(N["lineitem"])], pa.int64()),
    "l_linenumber": pa.array([i % 4 + 1 for i in range(N["lineitem"])], pa.int32()),
    "l_quantity": [float(rng.randrange(1, 51)) for _ in range(N["lineitem"])],
    "l_extendedprice": [nasty_price() for _ in range(N["lineitem"])],
    "l_discount": [rng.randrange(0, 11) / 100 for _ in range(N["lineitem"])],
    "l_tax": [rng.randrange(0, 9) / 100 for _ in range(N["lineitem"])],
    "l_returnflag": [rng.choice(["A","N","R"]) for _ in range(N["lineitem"])],
    "l_linestatus": [rng.choice(["F","O"]) for _ in range(N["lineitem"])],
    "l_shipdate": pa.array([base_ms + rng.randrange(0, 2400) * 86400000 for _ in range(N["lineitem"])], pa.timestamp("ms"))}),
    f"{out}/lineitem.parquet")

# events: ns timestamps with sub-microsecond parts, ties
ev_base_ns = 1704067200000000000
ts_ns = []
t = ev_base_ns
for i in range(N["events"]):
    t += rng.randrange(1, 400_000_000_000)  # up to ~6.7 min, odd ns
    ts_ns.append(t + rng.randrange(0, 1000))  # sub-microsecond noise
pq.write_table(pa.table({
    "event_id": pa.array(range(N["events"]), pa.int64()),
    "ts": pa.array(ts_ns, pa.timestamp("ns")),
    "user_id": pa.array([rng.randrange(40) for _ in range(N["events"])], pa.int64()),
    "event_type": [rng.choice(["click","view","purchase","signup","error"]) for _ in range(N["events"])],
    "value": [nasty_price() for _ in range(N["events"])],
    "props": [rng.choice(['{"k": %d}' % rng.randrange(100), '{"k": -5}', '{}', '{"k": 0}']) for _ in range(N["events"])]}),
    f"{out}/events.parquet")

# documents: duplicates, empty-ish docs, multi-space whitespace
texts = []
for i in range(N["documents"]):
    r = rng.random()
    if r < 0.1 and texts: texts.append(texts[rng.randrange(len(texts))])  # exact dup
    elif r < 0.15: texts.append("the")
    elif r < 0.2: texts.append("a  b   c")  # multi-space
    else: texts.append(" ".join(nasty_word() for _ in range(rng.randrange(5, 120))))
pq.write_table(pa.table({
    "doc_id": pa.array(range(N["documents"]), pa.int64()),
    "text": texts,
    "lang": [rng.choice(["en","de","es","fr","zh"]) for _ in range(N["documents"])],
    "source": [f"src{rng.randrange(5)}" for _ in range(N["documents"])],
    "n_chars": pa.array([len(t) for t in texts], pa.int64())}),
    f"{out}/documents.parquet")

embs = [[rng.uniform(-0.2, 0.2) for _ in range(64)] for _ in range(max(3, N["embeddings"]))]
embs[1] = embs[0][:]  # exact duplicate vector
embs[2] = [0.0] * 64  # zero vector (norm 0!)
embs = embs[:max(3, N["embeddings"])]
N["embeddings"] = len(embs)
pq.write_table(pa.table({
    "vec_id": pa.array(range(N["embeddings"]), pa.int64()),
    "embedding": pa.array([[float(x) for x in e] for e in embs], pa.list_(pa.float32())),
    "label": pa.array([rng.randrange(10) for _ in range(N["embeddings"])], pa.int32())}),
    f"{out}/embeddings.parquet")

print("wrote fuzz data to", out, {k: v for k, v in N.items()})
