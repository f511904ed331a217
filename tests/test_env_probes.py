"""Env-gate probe tests (VERDICT r6 #7): the gated paths must fail with
guidance naming the EXACT artifact to install — an opaque
AnalysisException/ImportError mid-job is the failure mode these gates
exist to prevent, so the wording itself is pinned against drift."""

from __future__ import annotations

import pytest

from kstreams_spark.functions import avro_codec
from kstreams_spark.operators import multimodal


def test_avro_guidance_names_jar_coordinate():
    assert "org.apache.spark:spark-avro_2.13" in avro_codec._GUIDANCE
    assert "spark.jars.packages" in avro_codec._GUIDANCE


def test_require_avro_raises_guidance_or_passes(spark):
    """In a jar-less env the plan-time probe must surface the coordinate;
    in an env that ships spark-avro it must pass silently (the probe
    auto-activates, per the standing env-gate rule)."""
    df = spark.range(1)
    try:
        avro_codec.require_avro(df)
        jar_present = True
    except RuntimeError as e:
        jar_present = False
        assert "org.apache.spark:spark-avro_2.13" in str(e)
        assert "spark.jars.packages" in str(e)
    # consistency: the boolean probe and the plan-time probe must agree
    # on a jar-present env; on a jar-less one avro_available() may still
    # be True (the Python module imports without the jar — its docstring
    # documents exactly this), so only the one-directional check holds.
    if jar_present:
        assert avro_codec.avro_available()


def test_compressed_codec_guidance_names_libraries():
    g = multimodal.COMPRESSED_DECODE_GUIDANCE
    for artifact in ("Pillow", "PIL", "soundfile", "ffmpeg"):
        assert artifact in g, f"guidance no longer names {artifact}"
    # r9/r10: the JPEG and PNG legs are retired — decode is real and
    # pure-stdlib; the guidance must say so instead of gating them
    assert "jpeg_codec" in g
    assert "png_codec" in g


def test_require_compressed_codecs_raises_or_passes():
    avail = multimodal.compressed_codecs_available()
    assert set(avail) == {"PIL", "soundfile", "ffmpeg"}
    if all(avail.values()):
        multimodal.require_compressed_codecs()  # must pass silently
    else:
        with pytest.raises(NotImplementedError) as ei:
            multimodal.require_compressed_codecs()
        msg = str(ei.value)
        assert "Pillow" in msg and "ffmpeg" in msg
        # every missing dep is listed by name
        for dep, ok in avail.items():
            if not ok:
                assert dep in msg
