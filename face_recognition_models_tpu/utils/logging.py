"""Console/file logging utilities.

Same surface as the reference's utils/utils.py: Tee (stdout + logfile),
AverageMeter (val/avg/sum/count), ProgressMeter (per-step console lines).
"""

from __future__ import annotations

import sys
from typing import IO, List, Sequence, Union


class Tee:
    """Write-through to several files (utils.py:3-17); use with
    contextlib.redirect_stdout to mirror training logs to log/<model>.txt."""

    def __init__(self, *files: IO):
        self.files = files
        self.primary = files[0] if files else sys.stdout

    def write(self, text: str):
        for f in self.files:
            f.write(text)

    def flush(self):
        for f in self.files:
            f.flush()

    def fileno(self):
        return self.primary.fileno()


class AverageMeter:
    """Running value/average tracker (utils.py:21-41)."""

    def __init__(self, name: str, fmt: str = ":f"):
        self.name = name
        self.fmt = fmt
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val: float, n: int = 1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / self.count

    def __str__(self):
        fmtstr = "{name} {val" + self.fmt + "} ({avg" + self.fmt + "})"
        return fmtstr.format(**self.__dict__)


class ProgressMeter:
    """Formatted per-step progress lines (utils.py:43-56)."""

    def __init__(self, num_batches: int, meters: Sequence[Union[AverageMeter, str]],
                 prefix: str = ""):
        self.batch_fmtstr = self._get_batch_fmtstr(num_batches)
        self.meters = meters
        self.prefix = prefix

    def display(self, batch: int):
        entries = [self.prefix + self.batch_fmtstr.format(batch)]
        entries += [str(m) for m in self.meters]
        print("\t".join(entries))

    @staticmethod
    def _get_batch_fmtstr(num_batches: int) -> str:
        num_digits = len(str(num_batches))
        fmt = "{:" + str(num_digits) + "d}"
        return "[" + fmt + "/" + fmt.format(num_batches) + "]"
