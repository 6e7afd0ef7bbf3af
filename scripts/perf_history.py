"""Perf-regression harness: replay bench.py across recent commits.

The reference can bisect QPS across git history
(hnswlib/tests/python/git_tester.py runs speedtest.py per commit;
draw_git_test_plots.py plots the series). This is the analogue for the
TPU rebuild: it checks out each of the last N commits into a throwaway
git worktree, runs `bench.py` there (sharing /tmp dataset/GT caches and
the persistent XLA compile cache, so per-commit cost is the sweep, not
data regen or cold compiles), and appends one JSON line per commit to
PERF_HISTORY (default /tmp/perf_history.jsonl):

  {"commit", "subject", "date", "qps", "vs_baseline", "metric",
   "wall_s", "ok"}

Round-3/4 taught that single BENCH artifacts can swing 2.4x on shared-
tunnel load alone; bench.py's per-rep min/med/max (stderr, kept when
PERF_VERBOSE=1) plus this series is the tooling that separates a code
regression (persists across commits) from a loaded tunnel (one-off).

Usage:
  [PERF_COMMITS=5] [PERF_ENV="BENCH_CONFIG=sift1m BENCH_ENGINE=cnns_flat"]
  [PERF_HISTORY=/tmp/perf_history.jsonl] python scripts/perf_history.py

The worktree is created from and removed at the end of each run; the
working tree you run from is never touched.
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_COMMITS = int(os.environ.get("PERF_COMMITS", 5))
HISTORY = os.environ.get("PERF_HISTORY", "/tmp/perf_history.jsonl")
WORKTREE = "/tmp/perf_history_worktree"


def git(*args, cwd=REPO):
    return subprocess.run(
        ("git",) + args, cwd=cwd, check=True,
        capture_output=True, text=True,
    ).stdout.strip()


def main():
    commits = git(
        "log", f"-{N_COMMITS}", "--format=%H|%cI|%s"
    ).splitlines()
    env = dict(os.environ)
    for kv in os.environ.get("PERF_ENV", "").split():
        k, _, v = kv.partition("=")
        env[k] = v
    # share the launch repo's persistent compile cache across worktrees
    env.setdefault("HNSW_NSG_TPU_CACHE", os.path.join(REPO, ".jax_cache"))
    results = []
    for line in commits:
        sha, date, subject = line.split("|", 2)
        subprocess.run(
            ["git", "worktree", "remove", "--force", WORKTREE],
            cwd=REPO, capture_output=True,
        )
        git("worktree", "add", "--detach", WORKTREE, sha)
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, "bench.py"], cwd=WORKTREE, env=env,
            capture_output=True, text=True, timeout=3600,
        )
        wall = time.time() - t0
        row = {
            "commit": sha[:12], "subject": subject, "date": date,
            "wall_s": round(wall, 1), "ok": proc.returncode == 0,
        }
        if proc.returncode == 0 and proc.stdout.strip():
            out = json.loads(proc.stdout.strip().splitlines()[-1])
            row.update(
                qps=out["value"], vs_baseline=out["vs_baseline"],
                metric=out["metric"],
            )
        else:
            row["stderr_tail"] = proc.stderr[-500:]
        if os.environ.get("PERF_VERBOSE"):
            print(proc.stderr, file=sys.stderr)
        results.append(row)
        with open(HISTORY, "a") as f:
            f.write(json.dumps(row) + "\n")
        print(
            f"{row['commit']} {row.get('qps', 'FAIL'):>9} qps  "
            f"{wall:6.0f}s  {subject[:60]}",
            flush=True,
        )
    subprocess.run(
        ["git", "worktree", "remove", "--force", WORKTREE],
        cwd=REPO, capture_output=True,
    )
    ok = [r for r in results if "qps" in r]
    if len(ok) >= 2:
        qps = [r["qps"] for r in ok]
        spread = (max(qps) - min(qps)) / max(qps)
        print(f"spread across {len(ok)} commits: {spread:.1%} "
              f"(min {min(qps):.0f}, max {max(qps):.0f})")


if __name__ == "__main__":
    main()
