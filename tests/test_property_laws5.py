"""Property-based law tests, batch 5: the multimodal plumbing.

The multimodal stages' claim is that everything EXCEPT the codec —
attach/typed metadata, Arrow batch feature extraction, subsample
resize, hop-windowed byte frames — is an exact, deterministic byte
function. These tests replay those definitions in plain Python over
hypothesis-generated payloads (empty, single-byte, high-bit bytes,
frame-boundary lengths) and require the mapInPandas / Catalyst
implementations to match byte-for-byte — pinning the batch plumbing
the stubbed decode seam will eventually feed.
"""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = settings(
    max_examples=10,
    derandomize=True,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

payloads_strategy = st.lists(st.binary(max_size=40), min_size=1, max_size=5)


def _payload_df(spark, payloads):
    return spark.createDataFrame(
        list(enumerate(payloads)), "doc_id LONG, payload BINARY"
    )


# --- decode_features == Python byte stats ----------------------------------


@given(payloads=payloads_strategy)
@SETTINGS
def test_decode_features_equals_byte_twin(spark, payloads):
    """The Arrow-batched feature extractor equals the plain-Python
    byte statistics for ANY payload, including empty (sentinel -1
    first/last) and full 0-255 byte range — one feature row per
    payload, none dropped across batch boundaries."""
    from real_time_fraud_revenue_intelligence_lakehouse_spark.ext.multimodal import decode_features

    df = _payload_df(spark, payloads)
    got = {
        r["doc_id"]: (
            r["byte_len"],
            r["first_byte"],
            r["last_byte"],
            r["byte_sum_mod"],
            r["n_frames"],
        )
        for r in decode_features(df).collect()
    }
    want = {
        i: (
            len(b),
            b[0] if len(b) else -1,
            b[-1] if len(b) else -1,
            sum(b) % 997,
            len(b) % 10 + 1,
        )
        for i, b in enumerate(payloads)
    }
    assert got == want


# --- resize_media == strided subsample + recomputed metadata ---------------


@given(
    payloads=payloads_strategy,
    target=st.sampled_from([8, 16, 256]),
)
@SETTINGS
def test_resize_media_equals_stride_twin(spark, payloads, target):
    """resize_media's 'resized' payload is EXACTLY the stride
    subsample b[::step] with step = max(len(b)//(w*h//64 or 1), 1),
    and the re-emitted metadata carries the target dimensions with
    byte_len recomputed JVM-side from the NEW payload."""
    from real_time_fraud_revenue_intelligence_lakehouse_spark.ext.multimodal import resize_media

    df = spark.createDataFrame(
        [
            (i, b, {"byte_len": len(b), "mime": "image/png", "width": 0, "height": 0})
            for i, b in enumerate(payloads)
        ],
        "doc_id LONG, payload BINARY, media_meta STRUCT<byte_len: LONG, mime: STRING, width: INT, height: INT>",
    )
    got = {
        r["doc_id"]: (bytes(r["payload"]), r["media_meta"].asDict())
        for r in resize_media(df, target_w=target, target_h=target).collect()
    }
    for i, b in enumerate(payloads):
        step = max(len(b) // (target * target // 64 or 1), 1)
        want_payload = b[::step]
        payload, meta = got[i]
        assert payload == want_payload
        assert meta["byte_len"] == len(want_payload)
        assert (meta["width"], meta["height"]) == (target, target)
        assert meta["mime"] == "image/png"


# --- frame_windows == Python hop-window slicing ----------------------------


@given(
    payloads=payloads_strategy,
    frame_len=st.sampled_from([4, 7, 16]),
    hop=st.sampled_from([2, 4, 5]),
)
@SETTINGS
def test_frame_windows_equals_slice_twin(spark, payloads, frame_len, hop):
    """frame_windows emits EXACTLY the hop-strided slices: one frame
    per start in (0, hop, …) while start < byte_len (a single empty
    frame for the empty payload), frame_bytes = the clipped tail
    length, and frame_md5 = md5 of the frame's uppercase hex — for
    ANY payload length including exact frame-boundary lengths."""
    from real_time_fraud_revenue_intelligence_lakehouse_spark.ext.multimodal import frame_windows

    df = _payload_df(spark, payloads)
    got = sorted(
        (r["doc_id"], r["frame_idx"], r["byte_len"], r["start_off"], r["frame_bytes"], r["frame_md5"])
        for r in frame_windows(df, frame_len=frame_len, hop=hop).collect()
    )
    want = []
    for i, b in enumerate(payloads):
        n_frames = 1 + max(len(b) - 1, 0) // hop
        for fi in range(n_frames):
            frame = b[fi * hop : fi * hop + frame_len]
            want.append(
                (
                    i,
                    fi,
                    len(b),
                    fi * hop,
                    min(frame_len, len(b) - fi * hop),
                    hashlib.md5(frame.hex().upper().encode()).hexdigest(),
                )
            )
    assert got == sorted(want)


# --- attach_binary metadata == the md5 dimension twin ----------------------


@given(texts=st.lists(st.text(alphabet="abc XYZ09", max_size=12), min_size=1, max_size=5))
@SETTINGS
def test_attach_binary_meta_equals_hash_twin(spark, texts):
    """attach_binary's typed metadata is a pure function of the text:
    payload = UTF-8 bytes, width = h % 1920 and height = (h div 1920)
    % 1080 from the md5-60bit content hash, mime by id parity — so
    the multimodal columns are reproducible from the source table on
    ANY engine (the property every downstream oracle relies on)."""
    from real_time_fraud_revenue_intelligence_lakehouse_spark.ext.multimodal import attach_binary

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id LONG, text STRING")
    got = {
        r["doc_id"]: (bytes(r["payload"]), r["media_meta"].asDict())
        for r in attach_binary(df).collect()
    }
    for i, t in enumerate(texts):
        h = int(hashlib.md5(t.encode("utf-8")).hexdigest()[:15], 16)
        payload, meta = got[i]
        assert payload == t.encode("utf-8")
        assert meta["byte_len"] == len(t.encode("utf-8"))
        assert meta["width"] == h % 1920
        assert meta["height"] == (h // 1920) % 1080
        assert meta["mime"] == ("image/png" if i % 2 == 0 else "audio/wav")
