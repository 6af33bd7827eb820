"""Physical-plan audit: for each declared query, check the properties that
matter at 100 TB — filter/projection pushdown into the parquet scan,
broadcast joins where a side is small, and absence of cartesian products
or raw-row nested-loop joins (a BNLJ is fine when its build side is a
bounded aggregate; see _raw_bnlj). Prints a per-query summary; use
--dump <name> for the full formatted plan.

Caveat: builders using the persisted()+eager-checkpoint discipline
(bicis_spark/caching.py — pagerank_part_supplier,
label_propagation_communities, bfs_part_supplier_hops, and the two
surprisal queries) execute eagerly and return a checkpointed frame, so their
audited "plan" is a Scan-ExistingRDD stub; audit those by reading their
loop bodies, not this output.

Known-benign BNLJ-RAW residue (boundedness is a call-site constant the
plan text cannot show): the ANN/embedding family — brute-force baselines
broadcast the bounded 1%-subset query side (dedup_embedding_cosine,
ann_topk_bruteforce, ann_*_recall's exact arm), and k-means first-round
assignment joins broadcast the seed rows, capped at max_lists /
max_clusters / max_codes constants (ann_topk_ivf, semantic_dedup_flags,
hard_negative_candidates, cluster_balanced_sample). Anything OUTSIDE
that family flagging
BNLJ-RAW is a real finding."""

from __future__ import annotations

import re
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from bicis_spark.plans import queries as registry
from bicis_spark.session import get_spark


_BOUNDED_BUILD = re.compile(
    r"HashAggregate|ObjectHashAggregate|SortAggregate|TakeOrderedAndProject"
    r"|OneRowRelation"
    # a literal local relation (createDataFrame of constants — e.g. the
    # 2080-row (i,j) dim-pair table of embedding_covariance_ints) is
    # bounded by construction: its row count is fixed in the program
    # text, independent of any input table
    r"|LocalTableScan"
)


def _raw_bnlj(plan: str) -> int:
    """Count BroadcastNestedLoopJoins whose broadcast build side contains
    NO aggregate / top-k at all — i.e. it broadcasts raw rows of some
    input, which grows with the data and is the real scale bug. A BNLJ
    whose build side is an aggregate (1-row scalar attach like split
    bounds / OLS stats, a constant-K centroid table, a vocab map, a top-k)
    is the intended bounded-side plan: boundedness comes from the
    aggregate's key cardinality, which the engine chooses to be constant
    at the call site (documented per operator in SCALE.md)."""
    tree = plan.split("\n\n", 1)[0].splitlines()

    def depth(s: str) -> int | None:
        m = re.search(r"[+:]-", s)
        return m.start() if m else None

    raw = 0
    for i, line in enumerate(tree):
        if "BroadcastNestedLoopJoin" not in line:
            continue
        d = depth(line)
        d = -3 if d is None else d  # root node: children at depth 0
        benign = False
        in_build = False
        for nxt in tree[i + 1 :]:
            nd = depth(nxt)
            if nd is None or nd <= d:
                break  # left the BNLJ's subtree
            if not in_build:
                # the build side is the BNLJ's DIRECT child exchange —
                # not an exchange buried in the probe branch feeding a BHJ
                if nd == d + 3 and "BroadcastExchange" in nxt:
                    in_build = True
                continue
            if nd <= d + 3:
                break  # left the exchange's subtree
            if _BOUNDED_BUILD.search(nxt):
                benign = True
                break
        if not benign:
            raw += 1
    return raw


def audit(plan: str) -> dict[str, object]:
    return {
        "pushed_filters": len(re.findall(r"PushedFilters: \[[^\]]+\]", plan))
        - plan.count("PushedFilters: []"),
        "scans": plan.count("Scan parquet"),
        "read_all_cols": bool(re.search(r"ReadSchema: [^\n]{400,}", plan)),
        "broadcast_joins": plan.count("BroadcastHashJoin"),
        "smj": plan.count("SortMergeJoin"),
        "shj": plan.count("ShuffledHashJoin"),
        "cartesian": plan.count("CartesianProduct"),
        "bnl": plan.count("BroadcastNestedLoopJoin"),
        "bnl_raw": _raw_bnlj(plan),
        "exchanges": plan.count("Exchange "),
        "reused_exchange": plan.count("ReusedExchange"),
    }


def main() -> None:
    spark = get_spark(app_name="explain_audit", cores=4, shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = "/root/testdata/sf0.01"
    dump = sys.argv[sys.argv.index("--dump") + 1] if "--dump" in sys.argv else None

    for name, fn in registry.queries().items():
        if dump and name != dump:
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(  # noqa: SLF001
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: ERROR {type(exc).__name__}: {exc}")
            continue
        if dump:
            print(plan)
            return
        a = audit(plan)
        flags = []
        if a["cartesian"]:
            flags.append("CARTESIAN!")
        if a["bnl_raw"]:
            flags.append("BNLJ-RAW!")
        if a["read_all_cols"]:
            flags.append("wide-read")
        print(
            f"{name}: scans={a['scans']} pushed={a['pushed_filters']} "
            f"bhj={a['broadcast_joins']} smj={a['smj']} shj={a['shj']} "
            f"exch={a['exchanges']} reused={a['reused_exchange']} "
            f"bnl={a['bnl']}/{a['bnl_raw']}raw {' '.join(flags)}"
        )


if __name__ == "__main__":
    main()
