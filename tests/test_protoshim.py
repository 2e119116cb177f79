"""Contract tests for the vendored mini-protobuf (vendor/protoshim).

ADVICE r8 pinned two API-contract gaps, both fixed and pinned here:

* ``Clear()``/``CopyFrom()`` must remove repeated fields that were
  auto-vivified via ``__getattr__`` + ``.append()`` (they live only in
  ``__dict__``, never in ``_set``) — a reused/copied message must not
  silently carry stale list items onto the wire.
* Reading a singular message-typed field must NOT mark it present
  (real proto3 write-through presence): a read of a oneof member
  before serialization must not flip ``WhichOneof``/``HasField`` or
  emit a spurious empty submessage; presence appears only once the
  child actually has content.
"""

from __future__ import annotations

import pytest

from spark_streaming_test_spark.vendor.protoshim.google.protobuf._mini import (
    LABEL_REPEATED,
    TYPE_INT64,
    TYPE_MESSAGE,
    TYPE_STRING,
    Descriptor,
    FieldDescriptor,
    FileDescriptor,
    build_classes,
)

LABEL_OPTIONAL = 1  # descriptor.proto value; the shim only names REPEATED


@pytest.fixture(scope="module")
def msgs():
    """A hand-built file: Inner{n:int64}, Outer{a:Inner|b:Inner oneof
    kind, items: repeated string, tag: string}."""
    inner = Descriptor("Inner", "t.Inner")
    inner.add_field(FieldDescriptor("n", 1, TYPE_INT64, LABEL_OPTIONAL))

    outer = Descriptor("Outer", "t.Outer")
    outer.oneofs = ["kind"]
    outer.add_field(
        FieldDescriptor("a", 1, TYPE_MESSAGE, LABEL_OPTIONAL, ".t.Inner", 0)
    )
    outer.add_field(
        FieldDescriptor("b", 2, TYPE_MESSAGE, LABEL_OPTIONAL, ".t.Inner", 0)
    )
    outer.add_field(FieldDescriptor("items", 3, TYPE_STRING, LABEL_REPEATED))
    outer.add_field(FieldDescriptor("tag", 4, TYPE_STRING, LABEL_OPTIONAL))

    fd = FileDescriptor("t.proto", "t")
    fd.message_types = [inner, outer]
    fd.message_types_by_name = {"Inner": inner, "Outer": outer}
    return build_classes(fd)


def test_clear_removes_vivified_repeated(msgs):
    m = msgs["Outer"]()
    m.items.append("x")  # auto-vivified: lives in __dict__, not _set
    assert m.SerializeToString() != b""
    m.Clear()
    assert m.items == []
    assert m.SerializeToString() == b""


def test_copyfrom_does_not_leak_vivified_repeated(msgs):
    src = msgs["Outer"](tag="fresh")
    dst = msgs["Outer"]()
    dst.items.append("stale")
    dst.CopyFrom(src)
    assert dst.items == []
    assert dst.tag == "fresh"
    assert dst == src


def test_read_of_submessage_does_not_mark_present(msgs):
    m = msgs["Outer"]()
    _ = m.a.n  # plain READ of a oneof member
    assert m.WhichOneof("kind") is None
    assert not m.HasField("a")
    assert m.SerializeToString() == b"", (
        "reading a submessage must not emit an empty field on the wire"
    )


def test_write_through_assignment_marks_present(msgs):
    m = msgs["Outer"]()
    m.a.n = 7  # the vivify-then-assign pattern the state clients use
    assert m.HasField("a")
    assert m.WhichOneof("kind") == "a"
    rt = msgs["Outer"]()
    rt.ParseFromString(m.SerializeToString())
    assert rt.a.n == 7


def test_read_then_write_other_oneof_member(msgs):
    m = msgs["Outer"]()
    _ = m.a.n  # read a; must not pre-empt the oneof
    m.b.n = 3
    assert m.WhichOneof("kind") == "b"
    assert not m.HasField("a")


def test_explicit_empty_submessage_assignment_is_present(msgs):
    # Assigning an (empty) child explicitly IS presence in proto3.
    m = msgs["Outer"]()
    m.a = msgs["Inner"]()
    assert m.HasField("a")
    assert m.WhichOneof("kind") == "a"


def test_clear_resets_vivified_submessage(msgs):
    m = msgs["Outer"]()
    m.a.n = 5
    m.Clear()
    assert not m.HasField("a")
    assert m.a.n == 0  # fresh vivification after Clear
    assert m.SerializeToString() == b""
