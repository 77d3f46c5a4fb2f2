#!/usr/bin/env python3
"""Round-close evidence gate (VERDICT r15 #5).

Round 15's only failures came from one end-of-round commit that changed
src/main AFTER the committed bench/correctness evidence was produced, so the
evidence no longer described the tree. This script makes that hole
mechanical to close:

  python3 tools/round_gate.py digest   # print the source-tree digest
  python3 tools/round_gate.py stamp    # record the digest in EVIDENCE.json
                                       # (run ONLY right after a full green
                                       # gate: sbt test + Verify/check.py +
                                       # Bench/bench_compare.py)
  python3 tools/round_gate.py check    # exit 1 if the tree has drifted
                                       # from the stamped evidence

The end-of-round snapshot procedure (README "Round close") is: run the full
gate, `stamp`, commit; any later commit that touches gate inputs must re-run
the gate and re-stamp, or `check` refuses the close.

The digest covers every gate INPUT: src/ (main and test — an unverified
spec change is still an unverified claim), build.sbt, project/, tools/.
Evidence OUTPUTS (EVIDENCE.json itself, bench_full.json, CORRECTNESS_*)
are excluded so stamping is idempotent.
"""
import hashlib
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EVIDENCE = os.path.join(ROOT, "EVIDENCE.json")


def tree_digest() -> str:
    h = hashlib.sha256()
    paths = []
    for base in ("src", "project", "tools"):
        d = os.path.join(ROOT, base)
        if not os.path.isdir(d):
            continue
        for dirpath, dirnames, filenames in os.walk(d):
            dirnames[:] = [x for x in dirnames if x != "target"]
            for f in filenames:
                p = os.path.join(dirpath, f)
                paths.append(os.path.relpath(p, ROOT))
    paths.append("build.sbt")
    for rel in sorted(paths):
        p = os.path.join(ROOT, rel)
        h.update(rel.encode())
        h.update(b"\0")
        with open(p, "rb") as fh:
            h.update(hashlib.sha256(fh.read()).digest())
    return h.hexdigest()


def main() -> int:
    cmd = sys.argv[1] if len(sys.argv) > 1 else "check"
    d = tree_digest()
    if cmd == "digest":
        print(d)
        return 0
    if cmd == "stamp":
        note = " ".join(sys.argv[2:]) or "full gate green: sbt test + Verify/check.py + Bench/bench_compare.py"
        with open(EVIDENCE, "w") as f:
            json.dump({"tree_digest": d, "note": note}, f, indent=2)
            f.write("\n")
        print(f"stamped {d}")
        return 0
    if cmd == "check":
        if not os.path.exists(EVIDENCE):
            print("round_gate: NO EVIDENCE.json — run the full gate, then "
                  "`tools/round_gate.py stamp`, before closing the round")
            return 1
        with open(EVIDENCE) as f:
            stamped = json.load(f)["tree_digest"]
        if stamped != d:
            print("round_gate: REFUSE — the source tree has drifted from the "
                  "stamped evidence.\n"
                  f"  stamped: {stamped}\n  current: {d}\n"
                  "Re-run the full gate (sbt test; Verify + tools/check.py; "
                  "Bench + tools/bench_compare.py) and re-stamp before the "
                  "snapshot commit. The r15 breakage shipped through exactly "
                  "this hole.")
            return 1
        print(f"round_gate: OK — evidence matches tree ({d[:16]}…)")
        return 0
    print(__doc__)
    return 2


if __name__ == "__main__":
    sys.exit(main())
