"""Identity-folder dataset indexer.

Equivalent of the reference's CASIAwebfaceDataset / LFWDataset construction
(dataset.py:74-136, 9-72): scan `root/<split>/<identity>/*.{jpg,jpeg,png}`,
assign integer labels per identity folder, shuffle once. Decoding is the
Loader's job; the index is just (paths, labels) plus the class maps.
"""

from __future__ import annotations

import os
import random
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

_IMAGE_EXTS = (".jpg", ".jpeg", ".png")


@dataclass
class ImageFolderIndex:
    root: str
    samples: List[Tuple[str, int]]        # (relative path, label)
    identities: List[str]
    class_to_idx: Dict[str, int]

    @property
    def idx_to_class(self) -> Dict[int, str]:
        return {i: name for name, i in self.class_to_idx.items()}

    @property
    def num_identities(self) -> int:
        return len(self.identities)

    def __len__(self) -> int:
        return len(self.samples)

    @classmethod
    def build(cls, root: str, split: Optional[str] = None,
              shuffle_seed: Optional[int] = 0) -> "ImageFolderIndex":
        """Index root[/split]/<identity>/<image> (dataset.py:93-119)."""
        base = os.path.join(root, split) if split else root
        if not os.path.isdir(base):
            raise FileNotFoundError(f"Directory {base} does not exist")
        identities = sorted(
            d for d in os.listdir(base)
            if os.path.isdir(os.path.join(base, d)))
        class_to_idx = {name: i for i, name in enumerate(identities)}
        samples: List[Tuple[str, int]] = []
        for identity in identities:
            label = class_to_idx[identity]
            ident_dir = os.path.join(base, identity)
            for image in sorted(os.listdir(ident_dir)):
                if image.lower().endswith(_IMAGE_EXTS):
                    samples.append((os.path.join(identity, image), label))
        if shuffle_seed is not None:
            random.Random(shuffle_seed).shuffle(samples)
        return cls(root=base, samples=samples, identities=identities,
                   class_to_idx=class_to_idx)

    @classmethod
    def concat(cls, indexes: Sequence["ImageFolderIndex"]
               ) -> "ImageFolderIndex":
        """Equivalent of the reference's ConcatDataset(train+valid)
        (model_utils.py:549-551). Labels must come from the same identity
        universe (same class_to_idx) in all parts."""
        if not indexes:
            raise ValueError("concat of zero indexes")
        first = indexes[0]
        samples = []
        for idx in indexes:
            if idx.class_to_idx != first.class_to_idx:
                raise ValueError(
                    "concat requires identical identity->label maps; "
                    "got differing class_to_idx")
            samples.extend(
                (os.path.join(idx.root, rel), lab) for rel, lab in idx.samples)
        return cls(root="", samples=samples, identities=first.identities,
                   class_to_idx=dict(first.class_to_idx))

    def absolute_paths(self) -> List[str]:
        return [os.path.join(self.root, rel) for rel, _ in self.samples]

    def labels(self) -> List[int]:
        return [lab for _, lab in self.samples]
