"""Collect the TPU batch's per-step logs into one committable summary.

`run_all.sh` writes each measurement step's stdout+stderr to
``/tmp/r2_<name>.log``; the grid steps additionally append rows to
``benchmarks/grid_*.csv`` and the JSON harnesses write their own
``benchmarks/*.json``. This script distills the log-only steps into
``benchmarks/tpu_batch/results_<tag>.md`` so the measured numbers live in
the repo next to the harnesses that produced them.

Usage: python benchmarks/tpu_batch/collect.py [logdir] [tag]
(defaults: /tmp, r2)
"""

import glob
import os
import re
import sys
import time

NOISE = re.compile(
    r"^(WARNING:|I\d{4}|E\d{4}|.*xla_bridge.*experimental"
    r"|persistent compile cache:)"
)
MAX_LINES = 80  # per log; keeps the summary reviewable


def distill(path: str) -> str:
    with open(path, errors="replace") as f:
        lines = [ln.rstrip() for ln in f]
    kept = [ln for ln in lines if ln and not NOISE.match(ln)]
    if len(kept) > MAX_LINES:
        kept = kept[:10] + ["... (%d lines elided) ..." % (len(kept) - 70)] \
            + kept[-60:]
    return "\n".join(kept)


def main() -> None:
    logdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp"
    tag = sys.argv[2] if len(sys.argv) > 2 else "r2"
    logs = sorted(glob.glob(os.path.join(logdir, f"{tag}_*.log")))
    if not logs:
        print(f"no {tag}_*.log under {logdir}", file=sys.stderr)
        sys.exit(1)
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            f"results_{tag}.md")
    parts = [f"# TPU batch results ({tag})\n",
             "Distilled from the batch step logs (see run_all.sh; grid "
             "rows land in benchmarks/grid_*.csv, JSON harnesses write "
             "benchmarks/*.json directly).\n"]
    for path in logs:
        name = os.path.basename(path)[len(tag) + 1:-4]
        if name in ("gate",):
            continue
        stamp = time.strftime("%Y-%m-%d %H:%M UTC",
                              time.gmtime(os.path.getmtime(path)))
        body = distill(path)
        parts.append(f"## {name}\n\n```\n{body}\n```\n")
        parts.append(f"_log mtime: {stamp}_\n")
    with open(out_path, "w") as f:
        f.write("\n".join(parts))
    print(f"wrote {out_path} from {len(logs)} logs")


if __name__ == "__main__":
    main()
