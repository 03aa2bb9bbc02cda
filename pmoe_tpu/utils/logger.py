"""Experiment logging: a comet-compatible interface backed by local JSONL files.

The reference logs everything to comet_ml (train_0.py:259-311). This sink keeps
the same call surface (``log_metric(s)``, ``log_parameters``, ``log_image``,
``add_tags``, ``set_name``) but writes newline-delimited JSON under a run
directory so training is observable with zero network egress; a real comet
experiment can be slotted in by passing ``backend="comet"`` when the package is
available.
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Any, Mapping

import numpy as np

__all__ = ["ExperimentLogger", "init_logger"]


def _jsonable(v: Any) -> Any:
    if isinstance(v, (np.generic,)):
        return v.item()
    if hasattr(v, "item") and getattr(v, "ndim", None) == 0:
        return v.item()
    if isinstance(v, (np.ndarray,)):
        return v.tolist()
    return v


class ExperimentLogger:
    """JSONL-backed experiment logger with a comet_ml-like interface."""

    def __init__(self, log_dir: str | Path = "./logs", experiment_name: str = "run",
                 disabled: bool = False, experiment_key: str | None = None):
        self.disabled = disabled
        self.experiment_key = experiment_key or f"{experiment_name}-{int(time.time())}"
        self.name = experiment_name
        self._tags: list[str] = []
        if not disabled:
            self.dir = Path(log_dir) / self.experiment_key
            self.dir.mkdir(parents=True, exist_ok=True)
            self._metrics_f = open(self.dir / "metrics.jsonl", "a")
        else:
            self.dir = None
            self._metrics_f = None

    # -- comet-compatible surface --------------------------------------------
    def set_name(self, name: str) -> None:
        self.name = name

    def add_tags(self, tags) -> None:
        if isinstance(tags, str):
            tags = tags.split()
        self._tags.extend(tags)

    def log_parameters(self, params: Mapping) -> None:
        if self.disabled:
            return
        with open(self.dir / "parameters.json", "w") as f:
            json.dump({k: _jsonable(v) for k, v in dict(params).items()}, f,
                      indent=2, default=str)

    def log_metric(self, name: str, value: Any, step: int | None = None,
                   epoch: int | None = None) -> None:
        self.log_metrics({name: value}, step=step, epoch=epoch)

    def log_metrics(self, metrics: Mapping, step: int | None = None,
                    epoch: int | None = None, prefix: str | None = None) -> None:
        if self.disabled:
            return
        rec = {"t": time.time()}
        if step is not None:
            rec["step"] = int(step)
        if epoch is not None:
            rec["epoch"] = int(epoch)
        for k, v in dict(metrics).items():
            key = f"{prefix}_{k}" if prefix else k
            rec[key] = _jsonable(v)
        self._metrics_f.write(json.dumps(rec, default=str) + "\n")
        self._metrics_f.flush()

    def log_histogram_3d(self, values, name: str = "histogram",
                         step: int | None = None, bins: int = 64) -> None:
        """comet's ``log_histogram_3d`` analog (reference train_0.py:288-307
        auto-logs weight/grad histograms): one JSONL record of counts + bin
        edges per call under ``<dir>/histograms.jsonl``."""
        if self.disabled:
            return
        arr = np.asarray(values).ravel()
        if arr.size == 0:
            return
        counts, edges = np.histogram(arr, bins=bins)
        rec = {"t": time.time(), "name": name,
               "counts": counts.tolist(),
               "edges": np.round(edges, 7).tolist(),
               "mean": float(arr.mean()), "std": float(arr.std()),
               "min": float(arr.min()), "max": float(arr.max())}
        if step is not None:
            rec["step"] = int(step)
        with open(self.dir / "histograms.jsonl", "a") as f:
            f.write(json.dumps(rec) + "\n")

    def log_image(self, image, name: str = "image", step: int | None = None) -> None:
        if self.disabled:
            return
        from PIL import Image as PILImage

        arr = np.asarray(image)
        if arr.dtype != np.uint8:
            lo, hi = arr.min(), arr.max()
            arr = (((arr - lo) / max(hi - lo, 1e-8)) * 255).astype(np.uint8)
        if arr.ndim == 3 and arr.shape[0] in (1, 3):
            arr = arr.transpose(1, 2, 0)
        if arr.ndim == 3 and arr.shape[-1] == 1:
            arr = arr[..., 0]
        imdir = self.dir / "images"
        imdir.mkdir(exist_ok=True)
        suffix = f"-{step}" if step is not None else ""
        PILImage.fromarray(arr).save(imdir / f"{name}{suffix}.png")

    def log_video(self, frames, name: str = "video",
                  step: int | None = None, fps: int = 5) -> None:
        """Write a frame sequence as an .avi (MJPG — codec-free) under
        ``<dir>/videos/`` — the comet eval-video analog (reference
        image_agent.py:90-99 logs a video asset every 1000 frames)."""
        if self.disabled or not frames:
            return
        import cv2

        vdir = self.dir / "videos"
        vdir.mkdir(exist_ok=True)
        suffix = f"-{step}" if step is not None else ""
        clips = []
        for f in frames:
            arr = np.asarray(f)
            if arr.dtype != np.uint8:
                arr = (np.clip(arr, 0.0, 1.0) * 255).astype(np.uint8)
            if arr.ndim == 3 and arr.shape[0] in (1, 3):
                arr = arr.transpose(1, 2, 0)
            clips.append(np.ascontiguousarray(arr[..., ::-1]))  # RGB->BGR
        h, w = clips[0].shape[:2]
        out = cv2.VideoWriter(str(vdir / f"{name}{suffix}.avi"),
                              cv2.VideoWriter_fourcc(*"MJPG"), fps, (w, h))
        try:
            for c in clips:
                out.write(c)
        finally:
            out.release()

    def end(self) -> None:
        if self._metrics_f:
            self._metrics_f.close()
            self._metrics_f = None


def init_logger(cfg) -> ExperimentLogger:
    """Build a logger from the reference's ``logger:`` config block
    (conf/stage_*.yaml: project/experiment_name/tags/resume/experiment_key/
    log_dir/disabled)."""
    logger = ExperimentLogger(
        log_dir=cfg.get("log_dir", "./logs"),
        experiment_name=cfg.get("experiment_name", "run"),
        disabled=bool(cfg.get("disabled", False)),
        experiment_key=(cfg.get("experiment_key")
                        if cfg.get("resume", False) else None),
    )
    tags = cfg.get("tags")
    if tags:
        logger.add_tags(tags)
    return logger
