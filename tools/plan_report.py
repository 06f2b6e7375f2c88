"""Generate PLANS.md: the formatted physical plan of every headline
query at sf0.1, plus the plan properties the engine treats as
contracts (pushed filters, read schemas, join strategies, shuffle
count). Regenerate after plan-affecting changes:

    python tools/plan_report.py
"""

import sys

sys.path.insert(0, "/root/repo")

from nrtwithdeltalake_spark.session import build_spark  # noqa: E402
from nrtwithdeltalake_spark.operators.registry import all_queries  # noqa: E402
from nrtwithdeltalake_spark.plans import inspect  # noqa: E402
from bench import HEADLINE, SF_DIR  # noqa: E402


def main() -> None:
    spark = build_spark(app_name="plan_report")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    out = [
        "# PLANS — headline-query physical plans (generated)",
        "",
        f"`python tools/plan_report.py` over `{SF_DIR}`. The plan",
        "properties asserted in tests/test_plans.py are summarized per",
        "query; full `explain('formatted')` output follows for audit.",
        "Shuffle counts are textual `Exchange` occurrences in the",
        "pre-execution plan: scalar-subquery trees print once per",
        "referencing conjunct but execute once (ReuseSubquery), so",
        "subquery-heavy plans (q_join_bloom_prefilter) overcount here.",
        "",
    ]
    for name in HEADLINE:
        df = queries[name](spark, SF_DIR)
        joins = inspect.join_strategies(df) or ["(none)"]
        pushed = inspect.pushed_filters(df)
        out += [
            f"## {name}",
            "",
            f"- joins: {', '.join(joins)}",
            f"- shuffles: {inspect.num_shuffles(df)}",
            f"- pushed filters: {len(pushed)}"
            + (f" ({'; '.join(pushed[:4])}{'…' if len(pushed) > 4 else ''})" if pushed else ""),
            "",
            "```",
            inspect.formatted_plan(df).strip(),
            "```",
            "",
        ]
    with open("/root/repo/PLANS.md", "w") as f:
        f.write("\n".join(out))
    print(f"wrote PLANS.md ({len(HEADLINE)} queries)")


if __name__ == "__main__":
    main()
