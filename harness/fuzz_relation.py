"""Randomized RELATION-API differential fuzzer: the same lazy
project/filter/aggregate/order/limit/distinct/set-op chain is applied to
BOTH duckdb's native DuckDBPyRelation and the engine's DuckRelation
(relation.py); the fetched row multisets must match. Drives the chain
composition layer the SQL fuzzers never touch — alias scoping, nested
view references, expression re-rewriting per step.
Usage: python harness/fuzz_relation.py [seed] [n_chains].
"""
import random
import sys

import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import duckdb
import duckdb_nsql_spark as dns

rng = random.Random(1)

TABLES = {
    "customer": ("c_custkey", ["c_acctbal"], ["c_mktsegment", "c_name"]),
    "orders": ("o_orderkey", ["o_totalprice"], ["o_orderstatus", "o_orderpriority"]),
    "part": ("p_partkey", ["p_retailprice", "p_size"], ["p_brand", "p_type"]),
    "supplier": ("s_suppkey", ["s_acctbal"], ["s_name"]),
}


def build_chain(t):
    """Returns a list of (method, args) steps plus the evolving column
    state, ending in a deterministic comparison-ready relation."""
    key, nums, strs = TABLES[t]
    num, s = rng.choice(nums), rng.choice(strs)
    steps = []
    aggregated = False
    for _ in range(rng.randint(1, 4)):
        r = rng.random()
        if aggregated:
            break
        if r < 0.3:
            steps.append(("filter", (rng.choice([
                f"{num} > {rng.randint(0, 80)}",
                f"{s} LIKE '%{rng.choice('AERST')}%'",
                f"{key} % {rng.randint(2, 9)} = 0",
                f"length({s}) % 2 = 0",
            ]),)))
        elif r < 0.55:
            steps.append(("project", (
                f"{key}, round({num} * {rng.randint(2, 5)}, 2) AS v0,"
                f" upper(substr({s}, 1, 4)) AS v1",
            )))
            num, s = "v0", "v1"
        elif r < 0.8:
            steps.append(("aggregate", (
                f"count(*) AS n, round(sum({num}), 2) AS sm, min({s}) AS mn",
                s,
            )))
            aggregated = True
        else:
            steps.append(("distinct", ()))
    if not aggregated and rng.random() < 0.5:
        steps.append(("order", (key,)))
        steps.append(("limit", (rng.randint(5, 40), rng.randint(0, 10))))
    return steps


def apply_chain(rel, steps):
    for method, args in steps:
        rel = getattr(rel, method)(*args)
    return rel


def build_combo(t, make_rel):
    """Set-op / join combinator: two filtered projections of the same
    table combined with union/except_/intersect, or a key self-join."""
    key, nums, strs = TABLES[t]
    num, s = rng.choice(nums), rng.choice(strs)
    r = rng.random()
    a = make_rel(f"SELECT {key} AS k, {s} AS s FROM {t}")
    b = make_rel(f"SELECT {key} AS k, {s} AS s FROM {t}")
    if r < 0.7:
        op = rng.choice(["union", "except_", "intersect"])
        fa = a.filter(f"k % {rng.randint(2, 5)} = 0")
        fb = b.filter(f"k % {rng.randint(2, 4)} = 1")
        return getattr(fa, op)(fb).order("k, s").limit(60)
    a2 = a.set_alias("lhs").filter(f"k < {rng.randint(50, 400)}")
    b2 = make_rel(
        f"SELECT {key} AS k2, round({num}, 1) AS v FROM {t}"
    ).set_alias("rhs")
    return (
        a2.join(b2, "lhs.k = rhs.k2", how=rng.choice(["inner", "left"]))
        .project("k, s, v")
        .order("k, s, v")
        .limit(60)
    )


def main() -> None:
    seed = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    sf = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.001"
    global rng
    rng = random.Random(seed)
    eng = dns.connect(cpus=8)
    eng.register_parquet_dir(sf)
    ddb = duckdb.connect()
    for t in TABLES:
        ddb.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    fails = 0
    for ci in range(n):
        t = rng.choice(list(TABLES))
        combo = rng.random() < 0.35
        state = rng.getstate()
        steps = None if combo else build_chain(t)
        base = f"SELECT * FROM {t}"
        derr = serr = d = s = None
        try:
            if combo:
                rng.setstate(state)
                d = build_combo(t, ddb.sql).fetchall()
            else:
                d = apply_chain(ddb.sql(base), steps).fetchall()
        except Exception as ex:  # noqa: BLE001
            derr = (str(ex).strip().splitlines() or ["err"])[0][:100]
        try:
            if combo:
                rng.setstate(state)
                s = build_combo(t, eng.sql).fetchall()
            else:
                s = apply_chain(eng.sql(base), steps).fetchall()
        except Exception as ex:  # noqa: BLE001
            serr = (str(ex).strip().splitlines() or ["err"])[0][:130]
        if derr and serr:
            continue
        ok = (
            derr is None and serr is None
            and sorted(map(str, d)) == sorted(map(str, s))
        )
        if not ok:
            fails += 1
            kind = "combo" if combo else "chain"
            print(f"=== RELATION MISMATCH #{fails} ({kind} {ci}, {t}) ===")
            for st in steps or []:
                print("  .", st)
            if derr or serr:
                print("  duckerr:", derr, "\n  sparkerr:", serr)
            else:
                diffs = [
                    (a, b)
                    for a, b in zip(sorted(map(str, d)), sorted(map(str, s)))
                    if a != b
                ][:3]
                print(f"  rows duck={len(d)} spark={len(s)} diffs={diffs}")
    print(f"RELATION FUZZ DONE: {n} chains, {fails} mismatches (seed {seed})")


if __name__ == "__main__":
    main()
