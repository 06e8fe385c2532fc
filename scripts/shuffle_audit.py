"""Per-query shuffle/IO audit: measured bytes, not guesses.

Runs every registered query at $SPARK_GRAFT_SF_DIR (default sf0.1)
with the Spark UI enabled and attributes completed stages to queries
by stage-id watermark, reading the REST metrics API
(`/api/v1/applications/<app>/stages`).  Output: one markdown table —
shuffle write bytes, shuffle read bytes, input bytes, task count —
written to docs/SHUFFLE_AUDIT.md plus a JSON sidecar next to it.

This is the 100 TB evidence the plan-shape tests can't give: a plan
can LOOK one-shuffle and still move the whole table through it.  The
audit shows what each query actually shuffles at sf0.1, so a future
regression ("why does q_X now shuffle 40× its input?") is a diff of
this file, not a hunch.  Streaming queries report their drain's batch
stages; queries that write scratch output include the write stages.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request


def _stages(ui: str, app: str) -> list[dict]:
    with urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app}/stages?status=complete"
    ) as r:
        return json.load(r)


def main() -> int:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as entrymod
    from flink_kmeans_clustering_spark.session import get_spark

    check = "--check" in sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        app_name="shuffle-audit", extra_conf={"spark.ui.enabled": "true"}
    )
    ui = spark.sparkContext.uiWebUrl
    with urllib.request.urlopen(f"{ui}/api/v1/applications") as r:
        app = json.load(r)[0]["id"]

    rows = []
    last_stage = -1
    for name, q in entrymod.queries().items():
        t0 = time.perf_counter()
        try:
            q(spark, sf_dir).write.format("noop").mode("overwrite").save()
            err = None
        except Exception as ex:  # keep auditing the rest
            err = repr(ex)[:80]
        secs = round(time.perf_counter() - t0, 2)
        time.sleep(0.2)  # let the listener bus drain
        stages = [s for s in _stages(ui, app) if s["stageId"] > last_stage]
        if stages:
            last_stage = max(s["stageId"] for s in stages)
        rows.append(
            {
                "query": name,
                "sec": secs,
                "stages": len(stages),
                "tasks": sum(s.get("numTasks", 0) for s in stages),
                "input_mb": round(
                    sum(s.get("inputBytes", 0) for s in stages) / 2**20, 1
                ),
                "shuffle_write_mb": round(
                    sum(s.get("shuffleWriteBytes", 0) for s in stages) / 2**20, 2
                ),
                "shuffle_read_mb": round(
                    sum(s.get("shuffleReadBytes", 0) for s in stages) / 2**20, 2
                ),
                "error": err,
            }
        )
        spark.catalog.clearCache()

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "docs"
    )
    # --check: regression gate against the COMMITTED baseline before
    # overwriting it — a query shuffling >2× its recorded bytes AND
    # >1 MB more is a scale regression (a lost broadcast, an unpushed
    # filter), not jitter.  Exit 1 so a round script can fail loudly.
    regressions = []
    baseline_path = os.path.join(out_dir, "shuffle_audit.json")
    if check and os.path.exists(baseline_path):
        with open(baseline_path) as fh:
            base = {
                r["query"]: r["shuffle_write_mb"]
                for r in json.load(fh).get("rows", [])
            }
        for r in rows:
            old = base.get(r["query"])
            new = r["shuffle_write_mb"]
            if old is not None and new > 2 * old and new - old > 1.0:
                regressions.append((r["query"], old, new))
    # One row per query, no exceptions: a duplicated row silently
    # doubles in the regression diff and confuses per-query history
    # (VERDICT r07 item 6 — a q_stream_attribution_ooo row was once
    # written twice).
    names = [r["query"] for r in rows]
    dupes = sorted({n for n in names if names.count(n) > 1})
    assert not dupes, f"duplicate audit rows for {dupes}"
    # On regression, leave the committed baseline untouched (so a re-run
    # reproduces the failure) and park the new numbers in a sidecar.
    audit_name = "shuffle_audit.regressed.json" if regressions else "shuffle_audit.json"
    with open(os.path.join(out_dir, audit_name), "w") as fh:
        json.dump({"sf_dir": sf_dir, "rows": rows}, fh, indent=1)
    md = [
        "# Shuffle audit (generated; measured, not estimated)",
        "",
        f"`python scripts/shuffle_audit.py` at `{sf_dir}`.  Bytes from the",
        "Spark REST metrics API, stages attributed per query by stage-id",
        "watermark.  Sorted by shuffle write.",
        "",
        "| query | sec | stages | tasks | input MB | shuffle write MB | shuffle read MB |",
        "|---|---|---|---|---|---|---|",
    ]
    for r in sorted(rows, key=lambda r: -r["shuffle_write_mb"]):
        md.append(
            f"| {r['query']} | {r['sec']} | {r['stages']} | {r['tasks']} "
            f"| {r['input_mb']} | {r['shuffle_write_mb']} | {r['shuffle_read_mb']} |"
        )
    with open(os.path.join(out_dir, "SHUFFLE_AUDIT.md"), "w") as fh:
        fh.write("\n".join(md) + "\n")
    print(f"wrote docs/SHUFFLE_AUDIT.md ({len(rows)} queries)")
    if regressions:
        for q, old, new in regressions:
            print(f"SHUFFLE REGRESSION: {q} {old} MB -> {new} MB")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
