"""Certification-ordering guard (r13, VERDICT r12 item 2).

The r12 process slip: the round's last recorded certification event
(PROGRESS.jsonl `round12_final_certification`, 11:13 UTC) PREDATED the
round's last source diff (the vector NULL-element contract, ~200 turns
later), so the shipped tree had no self-certifying record — the judge
had to close the gap independently. Rule adopted: **the round's last
certification event must postdate the round's last source change.**
This tool enforces it mechanically; run it as the final step of every
round (and after appending any certification event) — a failing exit
means the tree you are about to ship carries diffs no recorded board
has covered.

What counts as a source change (the certification's subject):
  * the newest committed change under the source globs (package,
    tools/, tests/, bench.py, __spark_entry__.py) — git committer
    timestamp, which is when the tree actually took the diff;
  * any UNCOMMITTED working-tree change to those paths (mtime) —
    uncommitted source is by definition uncertified.
Docs/JSON artifacts (VERDICT/ADVICE/BENCH_*/CORRECTNESS_*/PROGRESS,
*.md) are excluded: they record boards, they don't change behavior.

Usage: python tools/certification_guard.py [--json]
Exit 0 = certified (last certification >= last source change),
exit 1 = NOT certified, exit 2 = no certification event found.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys

SOURCE_GLOBS = (
    "tiny_etl_multiproc_bigdata_spark",
    "tools",
    "tests",
    "bench.py",
    "__spark_entry__.py",
)

_CERT_RE = re.compile(r"certification", re.IGNORECASE)


def _is_source(path: str) -> bool:
    return any(
        path == g or path.startswith(g + "/") for g in SOURCE_GLOBS
    ) and path.endswith(".py")


def _git(root: str, *args: str) -> str:
    return subprocess.run(
        ["git", "-C", root, *args],
        check=True,
        capture_output=True,
        text=True,
    ).stdout


def last_source_change(root: str) -> tuple[float, str]:
    """(timestamp, description) of the newest source change — the max
    of the newest committed source diff and any uncommitted one."""
    # newest commit touching a source path (committer ts: when the
    # local tree took the diff, robust to cherry-picked author dates)
    out = _git(
        root, "log", "-1", "--format=%ct %h", "--", *SOURCE_GLOBS
    ).strip()
    best_ts, best_what = 0.0, "no source commits"
    if out:
        ct, sha = out.split()
        best_ts, best_what = float(ct), f"commit {sha}"
    # uncommitted source changes (modified/added/untracked .py files)
    for line in _git(root, "status", "--porcelain").splitlines():
        path = line[3:].split(" -> ")[-1].strip().strip('"')
        if not _is_source(path):
            continue
        full = os.path.join(root, path)
        if os.path.exists(full):
            mt = os.path.getmtime(full)
            if mt > best_ts:
                best_ts, best_what = mt, f"uncommitted {path}"
    return best_ts, best_what


def last_certification(root: str) -> tuple[float, str]:
    """(timestamp, event-name) of the newest *certification* event in
    PROGRESS.jsonl; (0, '') if none."""
    best_ts, best_ev = 0.0, ""
    path = os.path.join(root, "PROGRESS.jsonl")
    try:
        with open(path) as f:
            for line in f:
                try:
                    row = json.loads(line)
                except ValueError:
                    continue
                ev = row.get("event", "")
                if _CERT_RE.search(ev) and row.get("ts", 0) > best_ts:
                    best_ts, best_ev = float(row["ts"]), ev
    except OSError:
        pass
    return best_ts, best_ev


def build_report(root: str) -> dict:
    src_ts, src_what = last_source_change(root)
    cert_ts, cert_ev = last_certification(root)
    return {
        "last_source_change_ts": src_ts,
        "last_source_change": src_what,
        "last_certification_ts": cert_ts,
        "last_certification_event": cert_ev,
        "certified": bool(cert_ev) and cert_ts >= src_ts,
    }


def main() -> int:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rep = build_report(root)
    if "--json" in sys.argv:
        print(json.dumps(rep, indent=1))
    else:
        print(
            f"last source change: {rep['last_source_change']} "
            f"(ts={rep['last_source_change_ts']:.0f})"
        )
        print(
            f"last certification: {rep['last_certification_event'] or 'NONE'} "
            f"(ts={rep['last_certification_ts']:.0f})"
        )
        print(
            "CERTIFIED — last certification postdates last source change"
            if rep["certified"]
            else "NOT CERTIFIED — source changed after the last recorded "
            "certification; re-run the boards and record a new event"
        )
    if not rep["last_certification_event"]:
        return 2
    return 0 if rep["certified"] else 1


if __name__ == "__main__":
    sys.exit(main())
