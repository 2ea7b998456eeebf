"""One-command parity check vs. reference golden outputs.

Usage:
    python -m da3slam_tpu.cli.parity [--parity_dir DIR]
    python -m da3slam_tpu.cli.parity --checkpoint CKPT --golden G1.npz [G2.npz ...]

The parity directory layout and golden (mini_npz) format are documented in
``da3slam_tpu/utils/parity.py``.  Exit code 0 = parity within thresholds on
every golden file; 1 = any failure; 2 = no parity data found.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

from da3slam_tpu.utils.parity import find_parity_dir, run_parity


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--parity_dir", default=None,
                    help="directory with checkpoint/ + golden/*.npz "
                         "(default: $DA3_PARITY_DIR or /root/repo/parity_data)")
    ap.add_argument("--checkpoint", default=None, help="checkpoint dir override")
    ap.add_argument("--golden", nargs="*", default=None, help="golden npz files")
    args = ap.parse_args(argv)

    checkpoint, goldens = args.checkpoint, args.golden
    if checkpoint is None or not goldens:
        pdir = Path(args.parity_dir) if args.parity_dir else find_parity_dir()
        if pdir is None:
            print("no parity data found (set --parity_dir or DA3_PARITY_DIR, "
                  "or create /root/repo/parity_data/{checkpoint,golden})")
            return 2
        checkpoint = checkpoint or str(pdir / "checkpoint")
        goldens = goldens or sorted(str(p) for p in (pdir / "golden").glob("*.npz"))
        if not goldens:
            print(f"no golden npz files under {pdir / 'golden'}")
            return 2

    results, ok = run_parity(checkpoint, goldens)
    print(f"parity: {sum(int(r['passed']) for r in results)}/{len(results)} "
          f"golden files passed")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
