"""Native TensorBoard event writer: output must be readable by stock
TensorBoard's own event-file loader (CRC framing + proto encoding)."""

import glob
import math

import pytest

from llm_qat_tpu.utils.logging_utils import MetricsLogger
from llm_qat_tpu.utils.tb_writer import ScalarEventWriter, _crc32c

tb_loader = pytest.importorskip(
    "tensorboard.backend.event_processing.event_file_loader"
)


def _load_events(log_dir):
    files = sorted(glob.glob(str(log_dir) + "/events.out.tfevents.*"))
    assert files, "no event file written"
    evs = []
    for f in files:
        evs.extend(tb_loader.EventFileLoader(f).Load())
    return evs


def _scalar(v):
    # TB's data-compat layer migrates simple_value -> rank-0 tensor
    if v.HasField("tensor"):
        return v.tensor.float_val[0]
    return v.simple_value


def test_crc32c_known_vectors():
    # RFC 3720 test vector: 32 zero bytes -> 0x8a9136aa
    assert _crc32c(b"\x00" * 32) == 0x8A9136AA
    assert _crc32c(b"123456789") == 0xE3069283


def test_scalar_events_roundtrip_through_tensorboard(tmp_path):
    w = ScalarEventWriter(str(tmp_path))
    w.add_scalars(1, {"loss": 2.5, "lr": 1e-4})
    w.add_scalars(2, {"loss": 1.25})
    w.close()

    evs = _load_events(tmp_path)
    assert evs[0].file_version == "brain.Event:2"
    scalars = {}
    for ev in evs[1:]:
        for v in ev.summary.value:
            scalars[(ev.step, v.tag)] = _scalar(v)
    assert scalars[(1, "loss")] == 2.5
    assert math.isclose(scalars[(1, "lr")], 1e-4, rel_tol=1e-6)
    assert scalars[(2, "loss")] == 1.25


def test_metrics_logger_defaults_tensorboard_on(tmp_path):
    # reference parity: --report_to tensorboard is the recipe default
    # (run_train.sh:34); no env var should be needed
    m = MetricsLogger(str(tmp_path))
    m.log(5, {"loss": 3.0, "grad_norm": 0.5})
    m.close()
    evs = _load_events(tmp_path)
    got = {v.tag: _scalar(v) for ev in evs for v in ev.summary.value}
    assert got["loss"] == 3.0 and got["grad_norm"] == 0.5


def test_metrics_logger_env_opt_out(tmp_path, monkeypatch):
    monkeypatch.setenv("LLM_QAT_TENSORBOARD", "0")
    m = MetricsLogger(str(tmp_path))
    m.log(1, {"loss": 1.0})
    m.close()
    assert not glob.glob(str(tmp_path) + "/events.out.tfevents.*")
    assert glob.glob(str(tmp_path) + "/metrics.jsonl")
