"""Physical-plan audit: for each declared query, check the properties that
matter at 100 TB — filter/projection pushdown into the parquet scan,
broadcast joins where a side is small, whole-stage codegen coverage, and
absence of cartesian products. Prints a per-query summary; use
--dump <name> for the full formatted plan.

Caveat: builders using the persisted()+eager-checkpoint discipline
(bicis_spark/caching.py — pagerank_part_supplier and the two surprisal
queries) execute eagerly and return a checkpointed frame, so their
audited "plan" is a Scan-ExistingRDD stub; audit those by reading their
loop bodies, not this output."""

from __future__ import annotations

import re
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from bicis_spark.plans import queries as registry
from bicis_spark.session import get_spark


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
        "exchanges": plan.count("Exchange "),
        "reused_exchange": plan.count("ReusedExchange"),
        "codegen_spans": len(set(re.findall(r"WholeStageCodegen \((\d+)\)", plan))),
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
        if a["bnl"]:
            flags.append("BNLJ!")
        if a["read_all_cols"]:
            flags.append("wide-read")
        print(
            f"{name}: scans={a['scans']} pushed={a['pushed_filters']} "
            f"bhj={a['broadcast_joins']} smj={a['smj']} shj={a['shj']} "
            f"exch={a['exchanges']} reused={a['reused_exchange']} "
            f"codegen={a['codegen_spans']} {' '.join(flags)}"
        )


if __name__ == "__main__":
    main()
