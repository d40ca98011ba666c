"""
Rate-limited progress logging for long host-side loops
(parity: dedalus/tools/progress.py:13 log_progress).
"""

import logging
import time

logger = logging.getLogger(__name__)


def log_progress(iterable, logger=logger, desc="progress", total=None,
                 interval=5.0, level=logging.INFO):
    """Yield from `iterable`, logging '<desc>: k/N (pct)' at most every
    `interval` seconds (and at completion)."""
    if total is None:
        try:
            total = len(iterable)
        except TypeError:
            total = None
    start = last = time.perf_counter()
    k = 0
    for item in iterable:
        yield item
        k += 1
        now = time.perf_counter()
        if now - last >= interval:
            last = now
            if total:
                rate = k / max(now - start, 1e-9)
                eta = (total - k) / max(rate, 1e-9)
                logger.log(level, "%s: %d/%d (%.0f%%, eta %.0fs)",
                           desc, k, total, 100 * k / total, eta)
            else:
                logger.log(level, "%s: %d", desc, k)
    if total and time.perf_counter() - start >= interval:
        logger.log(level, "%s: %d/%d (done in %.1fs)", desc, k, total,
                   time.perf_counter() - start)
