"""Serving-bench machinery: runs on CPU at tiny sizes, produces sane
records, and the export-path round trip measures the same program."""

import pytest

from graphical_gan_tpu.tools import bench_serving as bs


@pytest.mark.slow
def test_measure_family1_jit_and_export_paths():
    recs = bs.measure("gan_inference", batches=[4, 8], depth=2, rounds=2)
    assert [r["batch"] for r in recs] == [4, 8]
    for r in recs:
        assert r["path"] == "jit"
        assert r["latency_ms"] > 0
        assert r["samples_per_sec"] == pytest.approx(
            r["batch"] / (r["latency_ms"] / 1e3), rel=0.01)

    recs = bs.measure("gan_inference", batches=[4], depth=2, rounds=2,
                      via_export=True)
    assert recs[0]["path"] == "export"
    assert recs[0]["latency_ms"] > 0


@pytest.mark.slow
def test_measure_video_family_reports_frames():
    recs = bs.measure("ssgan", batches=[4], depth=1, rounds=1)
    r = recs[0]
    assert r["frames_per_sec"] == pytest.approx(
        4 * 16 / (r["latency_ms"] / 1e3), rel=0.01)  # published LEN=16


@pytest.mark.slow
def test_measure_int8_quantized_path():
    recs = bs.measure("gan_inference", batches=[4], depth=2, rounds=2,
                      quantize="int8")
    r = recs[0]
    assert r["quantize"] == "int8" and r["latency_ms"] > 0

    # the int8 path also survives the export round trip
    recs = bs.measure("gan_inference", batches=[4], depth=1, rounds=1,
                      via_export=True, quantize="int8")
    assert recs[0]["path"] == "export"
    assert recs[0]["quantize"] == "int8"

    with pytest.raises(ValueError, match="quantize"):
        bs.measure("gan_inference", batches=[4], depth=1, rounds=1,
                   quantize="fp4")


def test_measure_inference_entry():
    """--entry reconstructor: image-kind inputs drive the E->G forward and
    the record is labeled as the entry's own metric."""
    recs = bs.measure("gan_inference", batches=[4], depth=1, rounds=1,
                      entry="reconstructor")
    r = recs[0]
    assert r["metric"] == "gan_inference_reconstructor_serving_throughput"
    assert r["entry"] == "reconstructor" and r["latency_ms"] > 0
    with pytest.raises(ValueError, match="sampler entry only"):
        bs.measure("gan_inference", batches=[4], depth=1, rounds=1,
                   entry="reconstructor", quantize="int8")
