"""Scratch experiment: which summation forms are bit-identical between
Spark, DuckDB, and a naive python loop, on full-precision doubles?

Patterns probed:
  A. running sum over ORDER BY frame (unbounded preceding)
  B. sliding window sum (ROWS BETWEEN n-1 PRECEDING AND CURRENT ROW)
  C. groupBy sum via value-sorted list fold
  D. window list collection order (frame order?)
"""
import math
import random

import duckdb

from whisper_spark.session import get_spark

random.seed(42)
N = 2000
# adversarial: irrational magnitudes spanning ~12 orders
vals = [math.sqrt(i + 2) * 10 ** random.randint(-6, 6) for i in range(N)]
rows = [(i, v) for i, v in enumerate(vals)]

spark = get_spark(app_name="exp_detsum")
sdf = spark.createDataFrame(rows, "ts long, value double")
sdf.createOrReplaceTempView("t")

con = duckdb.connect()
con.execute("CREATE TABLE t (ts BIGINT, value DOUBLE)")
con.executemany("INSERT INTO t VALUES (?, ?)", rows)


def naive_running():
    out, acc = [], 0.0
    for v in vals:
        acc += v
        out.append(acc)
    return out


def naive_sliding(n):
    out = []
    for i in range(len(vals)):
        acc = 0.0
        for v in vals[max(0, i - n + 1): i + 1]:
            acc += v
        out.append(acc)
    return out


def cmp(name, a, b):
    bad = [(i, x, y) for i, (x, y) in enumerate(zip(a, b)) if repr(x) != repr(y)]
    print(f"{name}: {'MATCH' if not bad else f'DIFF {len(bad)}/{len(a)}'}"
          + (f" first={bad[0]}" if bad else ""))


# A. running sum
s = [r.v for r in spark.sql(
    "SELECT sum(value) OVER (ORDER BY ts ROWS BETWEEN UNBOUNDED PRECEDING "
    "AND CURRENT ROW) AS v FROM t ORDER BY ts").collect()]
d = [r[0] for r in con.execute(
    "SELECT sum(value) OVER (ORDER BY ts ROWS BETWEEN UNBOUNDED PRECEDING "
    "AND CURRENT ROW) AS v FROM t ORDER BY ts").fetchall()]
p = naive_running()
cmp("A spark-vs-python running", s, p)
cmp("A duck-vs-python running", d, p)

# B. sliding n=4
s = [r.v for r in spark.sql(
    "SELECT sum(value) OVER (ORDER BY ts ROWS BETWEEN 3 PRECEDING "
    "AND CURRENT ROW) AS v FROM t ORDER BY ts").collect()]
d = [r[0] for r in con.execute(
    "SELECT sum(value) OVER (ORDER BY ts ROWS BETWEEN 3 PRECEDING "
    "AND CURRENT ROW) AS v FROM t ORDER BY ts").fetchall()]
p = naive_sliding(4)
cmp("B spark-vs-python sliding4", s, p)
cmp("B duck-vs-python sliding4", d, p)

# B2. sliding via explicit list fold on both sides
s = [r.v for r in spark.sql(
    "SELECT aggregate(collect_list(value) OVER (ORDER BY ts ROWS BETWEEN 3 "
    "PRECEDING AND CURRENT ROW), cast(0.0 as double), (a, x) -> a + x) AS v "
    "FROM t ORDER BY ts").collect()]
d = [r[0] for r in con.execute(
    "SELECT list_reduce(list_prepend(0.0::DOUBLE, list(value) OVER "
    "(ORDER BY ts ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)), "
    "(a, x) -> a + x) AS v FROM t ORDER BY ts").fetchall()]
cmp("B2 spark-fold-vs-python sliding4", s, p)
cmp("B2 duck-fold-vs-python sliding4", d, p)

# C. groupBy sum via value-sorted fold (group = ts % 7)
s = {r.g: r.v for r in spark.sql(
    "SELECT ts % 7 AS g, aggregate(array_sort(collect_list(value)), "
    "cast(0.0 as double), (a, x) -> a + x) AS v FROM t GROUP BY 1").collect()}
d = {r[0]: r[1] for r in con.execute(
    "SELECT ts % 7 AS g, list_reduce(list_prepend(0.0::DOUBLE, "
    "list_sort(list(value) FILTER (value IS NOT NULL))), (a, x) -> a + x) "
    "AS v FROM t GROUP BY 1").fetchall()}
pref = {}
for g in range(7):
    acc = 0.0
    for v in sorted(x for i, x in enumerate(vals) if i % 7 == g):
        acc += v
    pref[g] = acc
ks = sorted(s)
cmp("C spark-sortedfold-vs-python", [s[k] for k in ks], [pref[k] for k in ks])
cmp("C duck-sortedfold-vs-python", [d[k] for k in ks], [pref[k] for k in ks])

# D. window list frame order in duckdb
d = con.execute(
    "SELECT list(value) OVER (ORDER BY ts ROWS BETWEEN 3 PRECEDING AND "
    "CURRENT ROW) AS v FROM t ORDER BY ts LIMIT 6").fetchall()
ok = all(r[0] == vals[max(0, i - 3): i + 1] for i, r in enumerate(d))
print("D duck window list frame order:", "MATCH" if ok else "DIFF")

spark.stop()
