"""Logging setup helpers.

Parity with the reference's use of the external ``pythonbasictools``
package (train.py:17-18, spike_func_comparison_training.py:28-29):
``logs_file_setup`` mirrors file+console logging initialization and
``log_device_setup`` logs the JAX device banner (the TPU-native analogue
of ``log_pytorch_device_setup``).
"""
from __future__ import annotations

import logging
import os
import pathlib
import sys
import time

__all__ = ["logs_file_setup", "log_device_setup"]


def logs_file_setup(script_file: str, log_dir: str = "logs",
                    level: int = logging.INFO) -> str:
    """Route the root logger to both stderr and a timestamped file named
    after the calling script.  Returns the log-file path."""
    name = pathlib.Path(script_file).stem
    os.makedirs(log_dir, exist_ok=True)
    stamp = time.strftime("%Y%m%d-%H%M%S")
    log_path = os.path.join(log_dir, f"{name}-{stamp}.log")
    handlers = [
        logging.StreamHandler(sys.stderr),
        logging.FileHandler(log_path),
    ]
    logging.basicConfig(
        level=level,
        format="%(asctime)s [%(levelname)s] %(name)s: %(message)s",
        handlers=handlers,
        force=True,
    )
    return log_path


def log_device_setup() -> None:
    """Log the JAX backend and device inventory."""
    import jax

    logger = logging.getLogger("snnimageclassification_tpu")
    logger.info("jax %s backend=%s", jax.__version__, jax.default_backend())
    for d in jax.devices():
        logger.info("device: %s", d)
