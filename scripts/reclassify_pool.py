"""Re-run the sanitize cascade over a saved sample pool under BOTH
acceptance modes — the acceptance-parity measurement of VERDICT r3 item 2.

The sample CLI stores every attempt's decoded arrays in samples_all.pkl
(finished AND failed), so the two cascade modes (chem/sanitize.py
reconstruct_from_generated: 'reference' = the reference's staged
fix_aromatic search, 'repo' = the documented more-general first-party
search) can be compared on the SAME molecule stream — a cleaner delta than
two independent sampling runs.

  python scripts/reclassify_pool.py outputs/<run_dir> \
      [--add_edge distance] [--json results/acceptance_parity.json]
"""
from __future__ import annotations

import argparse
import json
import os
import pickle
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def classify_all(decoded_list, mode, add_edge=None, workers=0):
    from moldiff_tpu.sample.pipeline import (
        _classify_batch,
        _make_classify_pool,
    )

    pool = _make_classify_pool(workers) if workers and workers > 1 else None
    try:
        return _classify_batch(decoded_list, add_edge, pool,
                               sanitize_mode=mode)
    finally:
        if pool is not None:
            pool.terminate()


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir")
    ap.add_argument("--modes", nargs="+", default=["reference", "repo"])
    ap.add_argument("--add_edge", choices=["distance"], default=None)
    ap.add_argument("--workers", type=int, default=0)
    ap.add_argument("--json", default=None)
    args = ap.parse_args(argv)

    with open(os.path.join(args.run_dir, "samples_all.pkl"), "rb") as f:
        saved = pickle.load(f)
    decoded = ([e["decoded"] for e in saved["finished"]]
               + [e["decoded"] for e in saved["failed"]])
    print(f"[reclassify] {len(decoded)} attempts "
          f"({len(saved['finished'])} finished / {len(saved['failed'])} "
          f"failed in the recorded run)")

    out = {"run_dir": args.run_dir, "n_attempts": len(decoded),
           "add_edge": args.add_edge, "modes": {}}
    entries_by_mode = {}
    for mode in args.modes:
        entries = classify_all(decoded, mode, args.add_edge, args.workers)
        entries_by_mode[mode] = entries
        ok = [e for e in entries if e["pool"] == "finished"]
        stages = Counter(e.get("stage") or "unknown" for e in ok)
        fails = Counter(e["reason"] for e in entries
                        if e["pool"] == "failed")
        out["modes"][mode] = {
            "success_rate": len(ok) / max(len(entries), 1),
            "num_finished": len(ok),
            "accept_stage_counts": dict(stages),
            "failure_reason_counts": dict(fails),
        }
        print(f"[reclassify] {mode}: {json.dumps(out['modes'][mode])}")

    if len(args.modes) == 2:
        a, b = args.modes
        ea, eb = entries_by_mode[a], entries_by_mode[b]
        only_a, only_b = [], []
        for i, (x, y) in enumerate(zip(ea, eb)):
            if x["pool"] == "finished" and y["pool"] != "finished":
                only_a.append(x.get("smiles"))
            elif y["pool"] == "finished" and x["pool"] != "finished":
                only_b.append(y.get("smiles"))
        out["divergence"] = {
            f"accepted_only_{a}": len(only_a),
            f"accepted_only_{b}": len(only_b),
            f"examples_only_{a}": only_a[:20],
            f"examples_only_{b}": only_b[:20],
        }
        print(f"[reclassify] divergence: {len(only_a)} only-{a}, "
              f"{len(only_b)} only-{b}")

    if args.json:
        os.makedirs(os.path.dirname(os.path.abspath(args.json)),
                    exist_ok=True)
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)
        print(f"[reclassify] wrote {args.json}")
    return out


if __name__ == "__main__":
    main()
