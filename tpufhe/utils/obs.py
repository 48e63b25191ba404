"""Observability helpers: logging, wall-clock timing, byte formatting.

TPU-native counterpart of the reference's example-level observability
surface — `log` + `env_logger` initialization (examples/sealpir.rs:38,
examples/mulpir.rs:49), the `timeit!`/`timeit_n!` macros
(examples/util.rs:18-48), and `indicatif::HumanBytes` size reporting
(examples/mulpir.rs:104-111). Like the reference, the core library
stays silent; models/benches opt in.

Env control (env_logger analogue): TPUFHE_LOG=debug|info|warning|error
enables stderr logging for the "tpufhe" logger tree.
"""

from __future__ import annotations

import logging
import os
import time
from contextlib import contextmanager

logger = logging.getLogger("tpufhe")


def init_logging(default: str | None = None) -> logging.Logger:
    """env_logger::init analogue: configure the tpufhe logger from
    TPUFHE_LOG (falling back to `default`, or warning)."""
    level_name = os.environ.get("TPUFHE_LOG", default or "warning").upper()
    level = getattr(logging, level_name, logging.WARNING)
    if not logger.handlers:
        h = logging.StreamHandler()
        h.setFormatter(
            logging.Formatter("[%(asctime)s %(levelname)s %(name)s] %(message)s",
                              "%H:%M:%S"))
        logger.addHandler(h)
    logger.setLevel(level)
    return logger


def human_bytes(n: int) -> str:
    """indicatif::HumanBytes analogue: 1536 -> '1.50 KiB'."""
    n = float(n)
    for unit in ("B", "KiB", "MiB", "GiB", "TiB"):
        if n < 1024 or unit == "TiB":
            if unit == "B":
                return f"{int(n)} B"
            return f"{n:.2f} {unit}"
        n /= 1024
    raise AssertionError("unreachable")


@contextmanager
def timeit(label: str, report: dict | None = None, key: str | None = None,
           n: int = 1):
    """timeit!/timeit_n! analogue: logs the (per-iteration) wall time of
    the block at info level; optionally records seconds into
    report[key or label]."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = (time.perf_counter() - t0) / max(n, 1)
        if dt >= 1.0:
            disp = f"{dt:.2f} s"
        elif dt >= 1e-3:
            disp = f"{dt * 1e3:.2f} ms"
        else:
            disp = f"{dt * 1e6:.0f} us"
        logger.info("%s: %s", label, disp)
        if report is not None:
            report[key or label] = dt
