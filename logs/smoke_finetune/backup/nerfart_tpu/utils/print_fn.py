"""Colored, master-only logging (reference utils/print_fn.py:39-63)."""
import logging
import sys

_COLORS = {
    logging.DEBUG: "\033[37m",     # white
    logging.INFO: "\033[36m",      # cyan
    logging.WARNING: "\033[33m",   # yellow
    logging.ERROR: "\033[31m",     # red
}
_RESET = "\033[0m"


class _ColorFormatter(logging.Formatter):
    def format(self, record):
        msg = super().format(record)
        color = _COLORS.get(record.levelno, "")
        return f"{color}{msg}{_RESET}" if sys.stderr.isatty() else msg


class _RankFilter(logging.Filter):
    """Only the master process emits (reference print_fn.py:51)."""
    rank = 0

    def filter(self, record):
        return _RankFilter.rank == 0


def init_log(name: str = "nerfart", rank: int = 0,
             level: int = logging.INFO) -> logging.Logger:
    _RankFilter.rank = rank
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler()
        handler.setFormatter(_ColorFormatter(
            "%(asctime)s %(levelname)s %(message)s", "%m-%d %H:%M:%S"))
        handler.addFilter(_RankFilter())
        logger.addHandler(handler)
    logger.setLevel(level)
    logger.propagate = False
    return logger


log = init_log()
