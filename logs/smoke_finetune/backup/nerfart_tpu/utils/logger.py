"""Training logger: in-memory stats + tensorboard + image/figure dumps.

Reproduces the reference Logger surface (reference utils/logger.py:67-159):
`add` scalars, `add_imgs`, `add_figure`, `add_histogram`, per-rank pickled
stats for offline plotting, master-only writes. Tensorboard is optional
(falls back to CSV-style JSONL when unavailable).
"""
import json
import os
import pickle
from collections import defaultdict
from typing import Optional

import numpy as np


def _to_numpy(x):
    if hasattr(x, "device_buffer") or type(x).__module__.startswith("jax"):
        return np.asarray(x)
    return np.asarray(x)


class Logger:
    def __init__(self, log_dir: str, img_dir: Optional[str] = None,
                 monitoring: Optional[str] = "tensorboard",
                 monitoring_dir: Optional[str] = None,
                 rank: int = 0, is_master: bool = True,
                 multi_process_logging: bool = False):
        self.rank = rank
        self.is_master = is_master
        self.log_dir = log_dir
        self.img_dir = img_dir or os.path.join(log_dir, "imgs")
        self.stats = defaultdict(lambda: defaultdict(list))
        self.monitoring = None
        self._jsonl = None

        if self.is_master:
            os.makedirs(log_dir, exist_ok=True)
            os.makedirs(self.img_dir, exist_ok=True)
        if monitoring == "tensorboard" and self.is_master:
            monitoring_dir = monitoring_dir or os.path.join(log_dir, "events")
            os.makedirs(monitoring_dir, exist_ok=True)
            try:
                from torch.utils.tensorboard import SummaryWriter
                self.monitoring = SummaryWriter(monitoring_dir)
            except Exception:
                self._jsonl = open(os.path.join(log_dir, "scalars.jsonl"), "a")
        elif monitoring in ("jsonl", "csv") and self.is_master:
            self._jsonl = open(os.path.join(log_dir, "scalars.jsonl"), "a")

    # ---------------- scalars
    def add(self, category: str, k: str, v, it: int):
        v = float(_to_numpy(v))
        self.stats[category][k].append((it, v))
        if self.monitoring is not None:
            self.monitoring.add_scalar(f"{category}/{k}", v, it)
        elif self._jsonl is not None:
            self._jsonl.write(json.dumps(
                {"category": category, "k": k, "v": v, "it": it}) + "\n")
            self._jsonl.flush()

    def add_vector(self, category: str, k: str, vec, it: int):
        vec = _to_numpy(vec)
        self.stats[category][k].append((it, vec.tolist()))

    # ---------------- images
    def add_imgs(self, imgs, class_name: str, it: int):
        """imgs: [B, C, H, W] in [0, 1] -> PNG grid + tensorboard."""
        if not self.is_master:
            return
        imgs = np.clip(_to_numpy(imgs), 0.0, 1.0)
        outdir = os.path.join(self.img_dir, class_name)
        os.makedirs(outdir, exist_ok=True)
        grid = _make_grid(imgs)
        _write_png(os.path.join(outdir, f"{it:08d}.png"), grid)
        if self.monitoring is not None:
            self.monitoring.add_image(class_name, grid.transpose(2, 0, 1), it)

    def add_figure(self, fig, class_name: str, it: int):
        if not self.is_master:
            return
        try:
            import matplotlib.pyplot as plt  # noqa: F401
            from matplotlib.backends.backend_agg import FigureCanvasAgg
            canvas = FigureCanvasAgg(fig)
            canvas.draw()
            data = np.frombuffer(canvas.buffer_rgba(), dtype=np.uint8)
            w, h = fig.canvas.get_width_height()
            img = data.reshape([h, w, 4])[:, :, :3]
            outdir = os.path.join(self.img_dir, class_name.replace("/", "_"))
            os.makedirs(outdir, exist_ok=True)
            _write_png(os.path.join(outdir, f"{it:08d}.png"),
                       img.astype(np.float32) / 255.0)
            if self.monitoring is not None:
                self.monitoring.add_image(
                    class_name, img.transpose(2, 0, 1), it)
            import matplotlib.pyplot as plt
            plt.close(fig)
        except Exception:
            pass

    def add_histogram(self, values, name: str, it: int):
        if self.monitoring is not None:
            self.monitoring.add_histogram(name, _to_numpy(values), it)

    # ---------------- persistence (reference logger.py:143-159)
    def save_stats(self, filename: str):
        path = os.path.join(self.log_dir, f"{filename}_{self.rank}"
                            if self.rank else filename)
        with open(path, "wb") as f:
            pickle.dump({k: dict(v) for k, v in self.stats.items()}, f)

    def load_stats(self, filename: str):
        path = os.path.join(self.log_dir, filename)
        if not os.path.exists(path):
            return
        try:
            with open(path, "rb") as f:
                loaded = pickle.load(f)
            for cat, d in loaded.items():
                for k, v in d.items():
                    self.stats[cat][k] = v
        except Exception:
            print(f"=> Failed loading stats from {path}")


def _make_grid(imgs: np.ndarray) -> np.ndarray:
    """[B, C, H, W] -> [H', W', C] tiled gallery (io_util.py:136-147)."""
    b, c, h, w = imgs.shape
    ncols = max(1, int(np.sqrt(b)))
    nrows = -(-b // ncols)
    canvas = np.zeros([nrows * h, ncols * w, c], imgs.dtype)
    for i in range(b):
        r, cc = divmod(i, ncols)
        canvas[r * h:(r + 1) * h, cc * w:(cc + 1) * w] = imgs[i].transpose(1, 2, 0)
    return canvas


def _write_png(path: str, img: np.ndarray):
    """img [H, W, C] float in [0,1] (or uint8)."""
    if img.dtype != np.uint8:
        img = (np.clip(img, 0, 1) * 255).astype(np.uint8)
    if img.shape[-1] == 1:
        img = np.repeat(img, 3, axis=-1)
    import imageio
    imageio.imwrite(path, img)
