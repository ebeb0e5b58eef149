"""Unit tests for the vendored minimal protobuf runtime
(name_matching_spark/vendor/pbshim) — the clean-room wire-format
implementation that un-gates transformWithStateInPandas where the
protobuf package is absent. The end-to-end evidence is
tests/test_streaming.py::test_tws_seeded_restart_closes_reoverflow
(the real state-server handshake through RocksDB); these tests pin the
wire format itself with golden bytes derived by hand from the public
encoding spec."""

import pytest

from name_matching_spark.vendor import ensure_protobuf

ensure_protobuf()

sm = pytest.importorskip("pyspark.sql.streaming.proto.StateMessage_pb2")


def test_golden_bytes_nested_oneof():
    # StateRequest.statefulProcessorCall (field 2, len-delim) →
    # StatefulProcessorCall.setHandleState (field 1) →
    # SetHandleState.state (field 1, varint) = INITIALIZED (2)
    req = sm.StateRequest(
        statefulProcessorCall=sm.StatefulProcessorCall(
            setHandleState=sm.SetHandleState(state=sm.INITIALIZED)
        )
    )
    assert req.SerializeToString() == bytes.fromhex("12040a020802")


def test_golden_bytes_scalars_and_default_skipping():
    # proto3 skips default-valued plain scalars: statusCode=0 is absent,
    # errorMessage (field 2) and value (field 3, bytes) are emitted
    resp = sm.StateResponse(statusCode=0, errorMessage="eh", value=b"\x01")
    assert resp.SerializeToString() == bytes.fromhex("120265681a0101")
    back = sm.StateResponse()
    back.ParseFromString(resp.SerializeToString())
    assert (back.statusCode, back.errorMessage, back.value) == (0, "eh", b"\x01")


def test_roundtrip_repeated_bytes_and_bool():
    msg = sm.StateResponseWithListGet(
        statusCode=7, value=[b"a", b"", b"long" * 100], requireNextFetch=True
    )
    back = sm.StateResponseWithListGet()
    back.ParseFromString(msg.SerializeToString())
    assert back.statusCode == 7
    assert back.value == [b"a", b"", b"long" * 100]
    assert back.requireNextFetch is True


def test_roundtrip_repeated_messages_and_proto3_optional():
    msg = sm.StateResponseWithTimer(
        timer=[sm.TimerInfo(key=b"k1", timestampMs=99), sm.TimerInfo(timestampMs=-5)]
    )
    back = sm.StateResponseWithTimer()
    back.ParseFromString(msg.SerializeToString())
    assert [(t.key, t.timestampMs) for t in back.timer] == [(b"k1", 99), (b"", -5)]
    # proto3_optional presence survives the round trip
    assert back.timer[0].HasField("key") and not back.timer[1].HasField("key")


def test_negative_int64_ten_byte_varint():
    msg = sm.RegisterTimer(expiryTimestampMs=-1)
    data = msg.SerializeToString()
    # two's-complement -1 → ten 0xFF-ish varint bytes after the tag
    assert len(data) == 11
    back = sm.RegisterTimer()
    back.ParseFromString(data)
    assert back.expiryTimestampMs == -1


def test_submessage_autovivify_marks_presence():
    cmd = sm.StateCallCommand()
    cmd.stateName = "s"
    cmd.ttl.durationMs = 1234
    back = sm.StateCallCommand()
    back.ParseFromString(cmd.SerializeToString())
    assert back.HasField("ttl") and back.ttl.durationMs == 1234
    fresh = sm.StateCallCommand()
    fresh.ParseFromString(sm.StateCallCommand(stateName="x").SerializeToString())
    assert not fresh.HasField("ttl")


def test_oneof_exclusivity():
    v = sm.ValueStateCall(stateName="s", get=sm.Get())
    assert v.WhichOneof("method") == "get"
    v.valueStateUpdate.value = b"z"  # vivifying another member switches
    assert v.WhichOneof("method") == "valueStateUpdate"
    back = sm.ValueStateCall()
    back.ParseFromString(v.SerializeToString())
    assert back.WhichOneof("method") == "valueStateUpdate"
    assert back.stateName == "s"


def test_unknown_fields_skipped():
    # bytes of a VALID unrelated message parsed as a schema that shares
    # no field numbers of compatible types must not crash: unknown
    # fields are skipped by wire type
    donor = sm.KeyAndValuePair(key=b"abc", value=b"xyz").SerializeToString()
    target = sm.GetProcessingTime()  # empty message: every field unknown
    target.ParseFromString(donor)
    assert target.SerializeToString() == b""


def test_enum_values_module_level():
    assert (sm.PRE_INIT, sm.CREATED, sm.INITIALIZED) == (0, 1, 2)
    assert (sm.DATA_PROCESSED, sm.TIMER_PROCESSED, sm.CLOSED) == (3, 4, 5)


def test_reading_unset_submessage_does_not_mark_presence():
    # real-protobuf semantics: a read returns a lazy view; presence (and
    # oneof state) change only when the view is written through
    cmd = sm.StateCallCommand(stateName="s")
    _ = cmd.ttl.durationMs  # read-only traversal
    assert not cmd.HasField("ttl")
    assert b"s" in cmd.SerializeToString() and len(cmd.SerializeToString()) == 3


def test_reading_unset_oneof_member_does_not_clear_sibling():
    v = sm.ValueStateCall(stateName="s", get=sm.Get())
    assert v.WhichOneof("method") == "get"
    _ = v.valueStateUpdate  # inspect the other member without writing
    _ = v.valueStateUpdate.value
    assert v.WhichOneof("method") == "get"  # sibling survives the read
    back = sm.ValueStateCall()
    back.ParseFromString(v.SerializeToString())
    assert back.WhichOneof("method") == "get"


def test_pending_view_aliases_until_committed():
    cmd = sm.StateCallCommand()
    view = cmd.ttl
    assert cmd.ttl is view  # repeated reads hand back the SAME view
    view.durationMs = 7  # first write commits it
    assert cmd.HasField("ttl") and cmd.ttl.durationMs == 7
    assert cmd.ttl is view


def test_stale_pending_view_detaches_on_sibling_assignment():
    v = sm.ValueStateCall(stateName="s")
    stale = v.valueStateUpdate  # pending view of one oneof member
    v.get.CopyFrom(sm.Get())  # commit the OTHER member (CopyFrom modifies)
    assert v.WhichOneof("method") == "get"
    stale.value = b"z"  # write through the detached view
    assert v.WhichOneof("method") == "get"  # must NOT steal the slot back


def test_repeated_append_through_view_marks_presence():
    resp = sm.StateResponseWithTimer()
    resp.timer.add(key=b"k", timestampMs=3)
    back = sm.StateResponseWithTimer()
    back.ParseFromString(resp.SerializeToString())
    assert [(t.key, t.timestampMs) for t in back.timer] == [(b"k", 3)]


def test_shim_coexists_with_other_google_namespace_portions(tmp_path):
    # the shim must not capture the 'google' name: with another PEP 420
    # google.* portion ALREADY imported, ensure_protobuf() must still make
    # google.protobuf importable AND leave the other portion importable
    # (regression: a regular-package google/__init__.py in the shim made
    # every other google.* distribution unimportable). Subprocess so the
    # import order is controlled and this process's modules stay clean.
    import os
    import subprocess
    import sys as _sys

    import name_matching_spark

    repo_root = os.path.dirname(os.path.dirname(name_matching_spark.__file__))
    portion = tmp_path / "dist" / "google" / "fakeauth"
    portion.mkdir(parents=True)
    (portion / "__init__.py").write_text("VALUE = 42\n")
    code = (
        "import sys\n"
        f"sys.path.insert(0, {str(tmp_path / 'dist')!r})\n"
        f"sys.path.insert(0, {repo_root!r})\n"
        "import google.fakeauth\n"  # other portion wins 'google' first
        "from name_matching_spark.vendor import ensure_protobuf\n"
        "assert ensure_protobuf() == 'shim'\n"
        "import google.protobuf\n"
        "import google.fakeauth\n"
        "assert google.fakeauth.VALUE == 42\n"
    )
    env = os.environ.copy()
    # an earlier test's SparkSession may have exported the shim on
    # PYTHONPATH (ensure_worker_pythonpath); strip it so the subprocess
    # really exercises the fallback path, not an inherited install
    env.pop("PYTHONPATH", None)
    r = subprocess.run(
        [_sys.executable, "-c", code], capture_output=True, text=True, env=env
    )
    assert r.returncode == 0, r.stderr


# ---------------------------------------------------------------------------
# property tests: wire-format roundtrip stability over adversarial values
# ---------------------------------------------------------------------------

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_I32 = st.integers(min_value=-(2**31), max_value=2**31 - 1)
_I64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)


@settings(max_examples=200, deadline=None)
@given(
    status=_I32,
    msg=st.text(max_size=40),
    val=st.binary(max_size=60),
)
def test_roundtrip_property_scalars(status, msg, val):
    m = sm.StateResponse(statusCode=status, errorMessage=msg, value=val)
    wire = m.SerializeToString()
    back = sm.StateResponse()
    back.ParseFromString(wire)
    assert (back.statusCode, back.errorMessage, back.value) == (status, msg, val)
    # re-serialization is a fixed point (canonical ordering by field number)
    assert back.SerializeToString() == wire


@settings(max_examples=200, deadline=None)
@given(ts=_I64)
def test_roundtrip_property_int64(ts):
    m = sm.RegisterTimer(expiryTimestampMs=ts)
    back = sm.RegisterTimer()
    back.ParseFromString(m.SerializeToString())
    assert back.expiryTimestampMs == ts


@settings(max_examples=100, deadline=None)
@given(
    timers=st.lists(
        st.tuples(st.one_of(st.none(), st.binary(max_size=20)), _I64), max_size=8
    )
)
def test_roundtrip_property_repeated_messages(timers):
    m = sm.StateResponseWithTimer(
        timer=[
            sm.TimerInfo(key=k, timestampMs=ts) if k is not None
            else sm.TimerInfo(timestampMs=ts)
            for k, ts in timers
        ]
    )
    back = sm.StateResponseWithTimer()
    back.ParseFromString(m.SerializeToString())
    assert [(t.key, t.timestampMs) for t in back.timer] == [
        (k if k is not None else b"", ts) for k, ts in timers
    ]
    # proto3_optional presence tracks whether the key was explicitly set
    assert [t.HasField("key") for t in back.timer] == [
        k is not None for k, _ in timers
    ]
