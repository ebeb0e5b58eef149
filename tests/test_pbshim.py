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
