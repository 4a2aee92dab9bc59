"""logs_file_setup / log_device_setup (pythonbasictools parity)."""
import logging

from snnimageclassification_tpu.utils.logging_setup import (
    log_device_setup,
    logs_file_setup,
)


def test_logs_file_setup_writes_file(tmp_path):
    log_path = logs_file_setup("myscript.py", log_dir=str(tmp_path / "logs"))
    logging.getLogger("x").info("hello world")
    log_device_setup()
    content = open(log_path).read()
    assert "hello world" in content
    assert "device:" in content
    assert "myscript" in log_path
    # restore a quiet root logger for the rest of the suite
    logging.basicConfig(force=True)
