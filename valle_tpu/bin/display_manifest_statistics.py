#!/usr/bin/env python3
"""Print duration statistics of cut manifests (for choosing duration
filters; parity with reference ``valle/bin/display_manifest_statistics.py``).
"""

import argparse
from pathlib import Path


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--manifest-dir", type=Path,
                        default=Path("data/tokenized"))
    parser.add_argument("--partitions", type=str, default="train,dev,test")
    args = parser.parse_args()

    from ..data import CutSet

    for part in args.partitions.split(","):
        path = args.manifest_dir / f"cuts_{part.strip()}.jsonl.gz"
        if not path.exists():
            print(f"(missing {path})")
            continue
        cuts = CutSet.from_file(path)
        print(f"== {part} ==")
        print(cuts.describe())
        print()


if __name__ == "__main__":
    main()
