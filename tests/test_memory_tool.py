"""HBM memory analysis tool (``tools/memory.py``).

Pins that the buffer-assignment readout is real (peak covers the
temporaries; arguments cover the resident state + data) and that the
memory knobs actually move the accounting in the expected direction —
``moment_dtype=bfloat16`` must shrink the train state, a bigger batch
must grow the temp working set.
"""

import json
import pytest

from graphical_gan_tpu.tools import memory as mem_tool

TINY = dict(dim=8, batch_size=8, dim_latent=16)


@pytest.mark.slow
def test_step_memory_fields_and_consistency():
    m = mem_tool.step_memory("float32", "gan", data_rows=64, **TINY)
    for k in ("argument_bytes", "output_bytes", "temp_bytes", "peak_bytes",
              "generated_code_bytes", "state_bytes", "param_bytes",
              "data_resident_bytes"):
        assert m[k] >= 0, k
    assert m["param_bytes"] > 0
    assert m["state_bytes"] >= m["param_bytes"]  # state = params + moments
    # arguments include the donated state and the resident data
    assert m["argument_bytes"] >= m["state_bytes"]
    assert m["argument_bytes"] >= m["data_resident_bytes"]
    # peak is the allocator's high-water mark WITH buffer reuse, so it can
    # sit below the total temp footprint — only positivity is guaranteed
    assert m["peak_bytes"] > 0


def test_moment_dtype_shrinks_state():
    f32 = mem_tool.step_memory("float32", "gan", data_rows=64, **TINY)
    bf16 = mem_tool.step_memory("float32", "gan", data_rows=64,
                                moment_dtype="bfloat16", **TINY)
    assert bf16["state_bytes"] < f32["state_bytes"]
    assert bf16["param_bytes"] == f32["param_bytes"]  # params untouched


def test_batch_size_grows_working_set():
    small = mem_tool.step_memory("float32", "gan", data_rows=64, **TINY)
    big = mem_tool.step_memory("float32", "gan", data_rows=64,
                               **{**TINY, "batch_size": 32})
    assert big["temp_bytes"] > small["temp_bytes"]


def test_cli_prints_one_json_line(capsys):
    rc = mem_tool.main(["--family", "gan", "--dtype", "float32",
                        "--batch-size", "8", "--dim", "8",
                        "--data-rows", "64"])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    rec = json.loads(out[-1])
    assert rec["metric"] == "step_memory"
    assert rec["peak_bytes"] > 0
    assert "device_kind" in rec
    # derived GiB fields accompany every byte field
    assert "peak_gib" in rec
