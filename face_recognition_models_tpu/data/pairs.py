"""Verification pair-list parsing.

Equivalent of the reference's LFWPairDataset / FlatPairDataset inputs
(dataset.py:258-360) and the pair loading in cross_validate_kfold
(model_utils.py:421-436): a `pair.list` file of lines `imgA imgB label`
(names without extension, images in `<root>/imgs/<name>.jpg`).
"""

from __future__ import annotations

import os
from typing import List, Tuple

import numpy as np


def load_pair_list(pairs_file: str) -> np.ndarray:
    """Parse pair.list -> int array [P, 3] of (a, b, label).

    Mirrors model_utils.py:422-436: skips blank lines and lines with fewer
    than 3 fields; fields are integers (image ids).
    """
    pairs: List[Tuple[int, int, int]] = []
    with open(pairs_file, "r") as f:
        for line in f:
            parts = line.strip().split()
            if len(parts) < 3:
                continue
            pairs.append((int(parts[0]), int(parts[1]), int(parts[2])))
    if not pairs:
        raise ValueError(f"No pairs parsed from {pairs_file}")
    return np.asarray(pairs, dtype=np.int64)


def pair_image_names(pairs_file: str) -> List[Tuple[str, str, int]]:
    """Parse pair.list as string names (LFWPairDataset semantics,
    dataset.py:283-299): returns [(nameA.jpg, nameB.jpg, label)], raising on
    malformed lines like the reference's assert."""
    out: List[Tuple[str, str, int]] = []
    with open(pairs_file, "r") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            parts = line.split()
            if len(parts) != 3:
                raise ValueError(
                    "There exist lines not having 3 elements")
            out.append((parts[0] + ".jpg", parts[1] + ".jpg", int(parts[2])))
    return out


def benchmark_paths(eval_root: str, benchmark: str) -> Tuple[str, str]:
    """(pair.list path, imgs dir) for one benchmark
    (evaluate_models.py:69-71 layout: <root>/<benchmark>/{pair.list,imgs})."""
    bench_dir = os.path.join(eval_root, benchmark)
    return os.path.join(bench_dir, "pair.list"), os.path.join(bench_dir, "imgs")
