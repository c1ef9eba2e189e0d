"""Lightweight in-place progress reporter with Hz speed and stamp lines.

Functional equivalent of the reference's ANSI Progress bar
(ddpo/utils/progress.py:7-184) without the multi-line cursor tricks: one
carriage-return line with rate and a param table on stamp().
"""

from __future__ import annotations

import sys
import time


class Progress:
    def __init__(self, total: int, name: str = "", print_every: int = 1):
        self.total = total
        self.name = name
        self.print_every = print_every
        self.count = 0
        self._start = time.time()
        self._last_desc = {}

    def __call__(self, description: dict | None = None, n: int = 1) -> None:
        self.count += n
        if description:
            self._last_desc = description
        if self.count % self.print_every:
            return
        elapsed = time.time() - self._start
        speed = self.count / elapsed if elapsed > 0 else 0.0
        desc = " | ".join(f"{k}: {_fmt(v)}" for k, v in self._last_desc.items())
        line = f"[ {self.name} ] {self.count}/{self.total} | {speed:.2f} Hz"
        if desc:
            line += f" | {desc}"
        sys.stdout.write("\r" + line + " " * 8)
        sys.stdout.flush()

    def stamp(self) -> None:
        elapsed = time.time() - self._start
        speed = self.count / elapsed if elapsed > 0 else 0.0
        desc = " | ".join(f"{k}: {_fmt(v)}" for k, v in self._last_desc.items())
        sys.stdout.write(
            f"\r[ {self.name} ] {self.count}/{self.total} in {elapsed:.1f}s "
            f"({speed:.2f} Hz) | {desc}\n"
        )
        sys.stdout.flush()


def _fmt(v):
    try:
        return f"{float(v):.4g}"
    except (TypeError, ValueError):
        return str(v)


class Silent:
    def __init__(self, *args, **kwargs):
        pass

    def __call__(self, *args, **kwargs):
        pass

    def stamp(self):
        pass
