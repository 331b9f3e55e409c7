#!/usr/bin/env python3
"""Historical performance tracking (reference:
benchmarks/run_historical_benchmarks.py:7-21).

Checks out past revisions of this repository into temp worktrees, runs the
benchmark suite at each, and collects dated CSV directories that
report.py renders into a single HTML page.

Usage: python benchmarks/run_historical_benchmarks.py --revisions HEAD~2 HEAD
"""

import argparse
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_at_revision(rev, out_root):
    date = subprocess.check_output(
        ["git", "-C", REPO, "show", "-s", "--format=%cs", rev], text=True
    ).strip()
    sha = subprocess.check_output(
        ["git", "-C", REPO, "rev-parse", "--short", rev], text=True
    ).strip()
    out_dir = os.path.join(out_root, f"{date}_{sha}")
    os.makedirs(out_dir, exist_ok=True)

    with tempfile.TemporaryDirectory() as tree:
        subprocess.check_call(
            ["git", "-C", REPO, "worktree", "add", "--detach", tree, rev]
        )
        try:
            subprocess.check_call(
                [sys.executable, os.path.join(tree, "benchmarks", "benchmark.py"),
                 "--path", out_dir, "--only", "func"],
                cwd=tree,
            )
        finally:
            subprocess.check_call(["git", "-C", REPO, "worktree", "remove", "--force", tree])
    return out_dir


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--revisions", nargs="+", default=["HEAD"])
    parser.add_argument("--out", default="/tmp/curl_tpu_historical")
    args = parser.parse_args()
    os.makedirs(args.out, exist_ok=True)
    for rev in args.revisions:
        print("benchmarking", rev)
        print("  ->", run_at_revision(rev, args.out))
    print(f"render with: python benchmarks/report.py --data {args.out}")


if __name__ == "__main__":
    main()
