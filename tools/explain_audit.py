"""Plan auditor: dump the executed physical plan of every bench query to
PLANS.md, with the scale-contract signals extracted per query (pushdown,
pruning, broadcast, top-k fusion, python ops, shuffle count).

Usage: python tools/explain_audit.py  (writes PLANS.md at repo root)
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def signals(plan: str) -> dict[str, str]:
    # AQE's toString appends the pre-adaptive "== Initial Plan ==" after the
    # final plan — counting both would double every shuffle. Audit the final
    # plan only.
    plan = plan.split("== Initial Plan ==")[0]
    return {
        "pushed filters": "yes" if "PushedFilters: [" in plan and "PushedFilters: []" not in plan else "—",
        "partition filters": "yes" if re.search(r"PartitionFilters: \[[^\]]", plan) else "—",
        "broadcast join": "yes" if "BroadcastHashJoin" in plan else "—",
        "top-k fused": "yes" if "TakeOrderedAndProject" in plan else "—",
        "codegen": "yes" if re.search(r"\*\(\d+\)", plan) else "—",
        # Row-wise Python (BatchEvalPython / PythonUDF in codegen) is a scale
        # defect; Arrow-batched kernels (ArrowEvalPython / MapInPandas /
        # mapInArrow) are the sanctioned vectorized escape hatch for dense
        # numeric math — flag them distinctly.
        "python ops": (
            "YES ⚠" if "BatchEvalPython" in plan
            else "arrow" if (
                "ArrowEvalPython" in plan
                or "MapInPandas" in plan
                or "MapInArrow" in plan
                # grouped-map kernels are Arrow-batched too (r11 verdict
                # blind spot: events_hmm_viterbi / text_mtld showed
                # `py: —` while their plans carried FlatMapGroupsInPandas)
                or "FlatMapGroupsInPandas" in plan
                or "FlatMapGroupsInPandasWithState" in plan
                or "MapGroupsInPandas" in plan
                or "TransformWithStateInPandas" in plan
                # cogrouped-map kernels too (r12: search_mmr_rerank's
                # greedy selection moved into one cogroup kernel)
                or "FlatMapCoGroupsInPandas" in plan
            )
            else "—"
        ),
        "cartesian": "YES ⚠" if "CartesianProduct" in plan else "—",
        # localCheckpoint()/checkpoint() truncate lineage: the audited
        # plan then STARTS from materialized RDDs (Scan ExistingRDD) and
        # every exchange that ran before the barrier is invisible here —
        # an exchanges count of 0 on a checkpointed key proves nothing
        # (r8 verdict: search_mmr_rerank showed 0 while its greedy
        # rounds each shuffled). Flag such plans loudly and star their
        # exchange counts so the tripwire can't be silently defeated.
        "ckpt": "yes ⚠" if "ExistingRDD" in plan else "—",
        "exchanges": str(plan.count("Exchange ") + plan.count("Exchange\n"))
        + ("*" if "ExistingRDD" in plan else ""),
    }


def _iter_nodes(node):
    """Yield every physical-plan node, descending through AQE wrappers
    (AdaptiveSparkPlanExec.executedPlan, QueryStageExec.plan) so the
    audit sees the FINAL plan, and through InMemoryTableScan's cached
    plan so rollups behind a persist() are still visible."""
    yield node
    name = node.nodeName()
    try:
        if name.startswith("AdaptiveSparkPlan"):
            yield from _iter_nodes(node.executedPlan())
            return
        if name.endswith("QueryStage"):
            yield from _iter_nodes(node.plan())
            return
    except Exception:
        pass
    ch = node.children()
    for i in range(ch.size()):
        yield from _iter_nodes(ch.apply(i))


def _subtree_has_agg(node) -> bool:
    for n in _iter_nodes(node):
        nm = n.nodeName()
        if "Aggregate" in nm:
            return True
    return False


def _subtree_is_two_phase(node) -> bool:
    """The second sanctioned shape (the win_ntile / orderby_limit_ties
    device): the global window's input was pruned by a FILTER on a
    rank computed by a PARTITIONED window — per-partition top-n, then
    rank the bounded union. Structurally: a Filter and a partitioned
    Window both below the unpartitioned one."""
    has_filter = False
    has_part_window = False
    first = True
    for n in _iter_nodes(node):
        if first:           # skip the unpartitioned window itself
            first = False
            continue
        nm = n.nodeName()
        if nm == "Filter":
            has_filter = True
        if nm == "Window":
            try:
                if not n.partitionSpec().isEmpty():
                    has_part_window = True
            except Exception:
                pass
    return has_filter and has_part_window


def unpartitioned_windows(df) -> str:
    """Tripwire (r11, VERDICT r10 task 7): a WindowExec with NO
    partition spec serializes the whole input through one task — safe
    ONLY over a domain-bounded rollup (hourly grids, cents histograms,
    K-row dims). Encode the invariant structurally: every
    empty-partition-spec Window must have an Aggregate somewhere below
    it in the final plan. Returns '—' (no unpartitioned windows),
    'bounded' (all sit above an aggregate), 'ckpt?' (input is a
    checkpointed RDD — boundedness not provable from this plan; judge
    from the operator's round structure), or 'YES ⚠' (an unpartitioned
    window over raw, unaggregated input — a scale defect)."""
    root = df._jdf.queryExecution().executedPlan()
    worst = "—"
    rank = {"—": 0, "bounded": 1, "two-phase": 2, "ckpt?": 3, "YES ⚠": 4}
    for n in _iter_nodes(root):
        if n.nodeName() != "Window":
            continue
        try:
            if not n.partitionSpec().isEmpty():
                continue
        except Exception:
            continue
        if _subtree_has_agg(n):
            v = "bounded"
        elif _subtree_is_two_phase(n):
            v = "two-phase"
        elif any("ExistingRDD" in m.nodeName() or "Scan ExistingRDD" in m.nodeName()
                 for m in _iter_nodes(n)):
            v = "ckpt?"
        else:
            v = "YES ⚠"
        if rank[v] > rank[worst]:
            worst = v
    return worst


def main() -> None:
    import __spark_entry__ as e
    from bench import BENCH_KEYS

    from quackflight_spark.session import get_spark

    spark = get_spark(app_name="explain_audit")
    queries = e.queries()

    # subset mode (argv keys): print signals to stdout, don't touch
    # PLANS.md — for iterating on one operator's plan.
    if len(sys.argv) > 1:
        for key in sys.argv[1:]:
            df = queries[key](spark, SF_DIR)
            df.collect()
            plan = df._jdf.queryExecution().executedPlan().toString()
            sig = signals(plan)
            sig["unpart.win"] = unpartitioned_windows(df)
            print(key, sig)
        return

    lines = [
        "# PLANS — executed physical plans of the bench queries",
        "",
        f"Auto-generated by tools/explain_audit.py at {SF_DIR} "
        f"(Spark {spark.version}, AQE on). Signals per query, then the",
        "final (post-AQE) plan. Regenerate after any operator change.",
        "",
        "`ckpt: yes ⚠` = the plan starts from checkpointed RDDs (lineage",
        "truncated by localCheckpoint); its starred exchange count covers",
        "only the FINAL segment — shuffles before the barrier are not",
        "visible to this audit and must be judged from the operator's",
        "round structure instead.",
        "",
        "`unpart.win` = WindowExec-with-no-partition-spec tripwire:",
        "`bounded` means every such window sits above an Aggregate in the",
        "final plan (a domain-bounded rollup); `two-phase` means its input",
        "was pruned by a filter on a PARTITIONED window's rank (the",
        "per-partition-top-n-then-global-rank device — also bounded);",
        "`ckpt?` means the window reads a checkpointed RDD so boundedness",
        "is judged from the operator's round structure; `YES ⚠` — an",
        "unpartitioned window over raw input — is a scale defect.",
        "",
        "| query | pushed | part.prune | bcast | top-k | codegen | py | cartesian | ckpt | exchanges | unpart.win |",
        "|---|---|---|---|---|---|---|---|---|---|---|",
    ]
    plans: list[str] = []
    for key in BENCH_KEYS:
        df = queries[key](spark, SF_DIR)
        df.collect()  # finalize AQE plan
        plan = df._jdf.queryExecution().executedPlan().toString()
        sig = signals(plan)
        sig["unpart.win"] = unpartitioned_windows(df)
        lines.append(
            f"| {key} | {sig['pushed filters']} | {sig['partition filters']} | "
            f"{sig['broadcast join']} | {sig['top-k fused']} | {sig['codegen']} | "
            f"{sig['python ops']} | {sig['cartesian']} | {sig['ckpt']} | "
            f"{sig['exchanges']} | {sig['unpart.win']} |"
        )
        head = "\n".join(plan.splitlines()[:40])
        plans.append(f"## {key}\n\n```\n{head}\n```\n")

    out = "\n".join(lines) + "\n\n" + "\n".join(plans)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "PLANS.md"), "w") as f:
        f.write(out)
    print(f"wrote PLANS.md ({len(BENCH_KEYS)} queries)")


if __name__ == "__main__":
    main()
