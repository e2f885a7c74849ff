#!/usr/bin/env python3
"""Measure the reference engine's (mreza822/Lineage-Store-DBMS, /root/reference)
single-node throughput on its OWN query API, feeding it the same orders rows
graft's ls_* fixture uses — the numbers behind BASELINE.md.

Run from a scratch cwd (the reference writes './ECS165'-relative state):
    mkdir -p /tmp/refbench && cd /tmp/refbench && python3 /root/repo/tools/ref_bench.py sf0.01

Notes on fidelity:
- Insert exercises the in-memory fast path (base pages + page_directory +
  per-column index). The reference also appends every insert to a whole-file
  CSV rewrite (table.py Bpage_insert), but only when the CSV exists; we bench
  without it (reads are unaffected) and report the with-CSV insert separately
  at small n, because it is O(n) per call and O(n^2) total by construction.
- update REQUIRES the CSV (pd.read_csv outside try/except); it rewrites the
  whole file per call, so we measure a bounded sample and report per-op cost.
- select_version/sum_version are `pass` stubs in the reference (query.py) —
  recorded as not-implemented.
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/reference")
import duckdb
import pandas as pd

# the reference does not run as checked in: table.py imports `lstore.time`,
# a module absent from the repo — stub it with stdlib time so the engine loads
import types
_t = types.ModuleType("lstore.time")
_t.time = time.time
sys.modules["lstore.time"] = _t

from lstore.db import Database
from lstore.query import Query

sf = sys.argv[1] if len(sys.argv) > 1 else "sf0.01"
rows = duckdb.connect().execute(
    f"""SELECT o_orderkey, o_custkey,
               CASE o_orderstatus WHEN 'O' THEN 0 WHEN 'F' THEN 1 ELSE 2 END,
               CAST(o_totalprice * 100 AS BIGINT)
        FROM read_parquet('/root/testdata/{sf}/orders.parquet')
        ORDER BY o_orderkey""").fetchall()
n = len(rows)
print(f"[ref_bench] {sf}: {n} orders rows", flush=True)

os.makedirs("./db", exist_ok=True)
# the engine resolves its CSV path through a module global (`pathway`) that
# db.open() does NOT set — with open() it stays "", so the table CSV lands in
# the CWD as ./orders.csv. A leftover CSV silently flips EVERY insert onto
# the whole-file-rewrite path (O(n) per insert); start clean.
if os.path.exists("./orders.csv"):
    os.remove("./orders.csv")
db = Database()
db.open(os.path.abspath("./db"))
table = db.create_table("orders", 4, 0)
q = Query(table)

out = {"sf": sf, "n_rows": n}

def timed(name, fn, count=1):
    t0 = time.perf_counter()
    fn()
    dt = time.perf_counter() - t0
    out[name] = {"sec": round(dt, 4), "ops": count,
                 "ops_per_sec": round(count / dt, 1) if dt > 0 else None}
    print(f"[ref_bench] {name}: {dt:.3f}s for {count} ops", flush=True)

# 1. bulk insert, in-memory fast path (no CSV present)
timed("insert_all", lambda: [q.insert(*r) for r in rows], n)

# 2. point selects by primary key
keys = [rows[i][0] for i in range(0, n, max(1, n // 1000))][:1000]
proj = [1, 1, 1, 1]
timed("select_point_x1000",
      lambda: [q.select(k, 0, proj) for k in keys], len(keys))

# 3. key-range aggregates over [first_key, first_key+2000] (graft ls_sum_range shape)
lo = rows[0][0]
timed("sum_range_2000", lambda: q.sum(lo, lo + 2000, 3), 1)
timed("avg_range_2000", lambda: q.avg(lo, lo + 2000, 3), 1)
timed("count_range_2000", lambda: q.count(lo, lo + 2000, 3), 1)

# 4. select_distinct on a secondary column value
timed("select_distinct", lambda: q.select_distinct(rows[0][1], 1, proj), 1)

# 5. full-table order_by (desc, like graft ls_order_by)
timed("order_by", lambda: q.order_by(3, ascending=False), 1)

# 6. updates — need the CSV the reference persists to; prime it, then a
#    bounded sample (each update rewrites the whole file: O(n) per op)
csv_path = os.path.join(db.get_path(), "orders.csv")
pd.DataFrame([list(r) for r in rows],
             columns=[f"Column_{i+1}" for i in range(4)]).to_csv(csv_path, index=False)
upd_keys = keys[:30]
timed("update_x30",
      lambda: [q.update(k, None, None, None, 999_99) for k in upd_keys],
      len(upd_keys))

# 7. increment: crashes in the reference (query.py:247 indexes a Record
#    object, `r[column]` — Record has no __getitem__); its documented cost
#    is select + update, i.e. the update_x30 per-op number above
out["increment"] = "crashes in reference (query.py:247 Record not subscriptable)"

# 8. deletes (in-memory: index locate + invalidate)
del_keys = [rows[i][0] for i in range(1, n, max(1, n // 500))][:500]
timed("delete_x500", lambda: [q.delete(k) for k in del_keys], len(del_keys))

out["select_version"] = "not implemented in reference (query.py:125 `pass`)"
out["sum_version"] = "calls the select_version stub -> returns False"

print(json.dumps(out))
