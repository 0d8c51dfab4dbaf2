"""Multi-host logging helpers.

Equivalent of the reference's EPIC logging module
(/root/reference/src/epic_sounds/epic_data/logging.py:19-96): logging only
on the primary process, print suppression elsewhere, a stdout.log file
handler, and json-serialized stat lines — reworked for jax.process_index()
instead of torch.distributed ranks.
"""

from __future__ import annotations

import builtins

import json
import logging
import os
import sys


def is_master_proc() -> bool:
    import jax

    return jax.process_index() == 0


def suppress_print() -> None:
    """Swallow print() on non-master processes (logging.py:19-27)."""

    def print_none(*objects, sep=" ", end="\n", file=sys.stdout, flush=False):
        pass

    builtins.print = print_none


def setup_logging(output_dir: str | None = None,
                  name: str = "aum_tpu") -> logging.Logger:
    """Master-only logger with optional stdout.log file (logging.py:37-71)."""
    logger = logging.getLogger(name)
    logger.setLevel(logging.DEBUG)
    logger.propagate = False
    for h in list(logger.handlers):
        logger.removeHandler(h)
    fmt = logging.Formatter(
        "[%(asctime)s][%(levelname)s] %(filename)s: %(lineno)3d: %(message)s",
        datefmt="%m/%d %H:%M:%S")
    if is_master_proc():
        sh = logging.StreamHandler(stream=sys.stdout)
        sh.setFormatter(fmt)
        logger.addHandler(sh)
        if output_dir is not None:
            os.makedirs(output_dir, exist_ok=True)
            fh = logging.FileHandler(os.path.join(output_dir, "stdout.log"))
            fh.setFormatter(fmt)
            logger.addHandler(fh)
    else:
        suppress_print()
        logger.addHandler(logging.NullHandler())
    return logger


def log_json_stats(stats: dict, logger: logging.Logger | None = None) -> None:
    """json-line stats (logging.py:84-96)."""
    rounded = {k: round(v, 5) if isinstance(v, float) else v
               for k, v in stats.items()}
    line = json.dumps(rounded, sort_keys=True, default=str)
    (logger or logging.getLogger("aum_tpu")).info("json_stats: %s", line)
