"""TFRecord input format — pure-Python reader, no TensorFlow dependency.

Capability parity with the reference's TFRecordDataLoader
(/root/reference/fuxictr/tensorflow/dataloaders/tf_dataloader.py:23-112),
which builds its schema from the FeatureMap exactly as done here. The
format is the standard TFRecord framing

    uint64 length | uint32 masked-crc32c(length) | payload | uint32 crc32c

around ``tf.train.Example`` protos. The proto subset needed (Example →
Features → map<string, Feature> → Bytes/Float/Int64List) is decoded with a
small hand-rolled wire-format reader — pulling in TF for one container
format would be absurd on a TPU host image. CRCs are length-checked but
not verified (zlib ships crc32, not crc32c; corruption surfaces as a
framing error).
"""

import struct

import numpy as np

_WIRE_VARINT = 0
_WIRE_64BIT = 1
_WIRE_LEN = 2
_WIRE_32BIT = 5


def _read_varint(buf, pos):
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _skip(buf, pos, wire):
    if wire == _WIRE_VARINT:
        return _read_varint(buf, pos)[1]
    if wire == _WIRE_64BIT:
        return pos + 8
    if wire == _WIRE_LEN:
        n, pos = _read_varint(buf, pos)
        return pos + n
    if wire == _WIRE_32BIT:
        return pos + 4
    raise ValueError(f"unsupported wire type {wire}")


def _fields(buf):
    """Yield (field_number, wire_type, value_or_span) over a message."""
    pos = 0
    end = len(buf)
    while pos < end:
        tag, pos = _read_varint(buf, pos)
        field, wire = tag >> 3, tag & 7
        if wire == _WIRE_LEN:
            n, pos = _read_varint(buf, pos)
            yield field, wire, buf[pos:pos + n]
            pos += n
        elif wire == _WIRE_VARINT:
            v, pos = _read_varint(buf, pos)
            yield field, wire, v
        else:
            new_pos = _skip(buf, pos, wire)
            yield field, wire, buf[pos:new_pos]
            pos = new_pos


def _parse_value_list(buf):
    """Feature proto → list of python values (bytes/float/int)."""
    for field, wire, val in _fields(buf):
        if field == 1:      # BytesList
            return [v for f, w, v in _fields(val) if f == 1]
        if field == 2:      # FloatList (packed or repeated)
            out = []
            for f, w, v in _fields(val):
                if f != 1:
                    continue
                if w == _WIRE_LEN:
                    out.extend(struct.unpack(f"<{len(v) // 4}f", v))
                else:
                    out.append(struct.unpack("<f", v)[0])
            return out
        if field == 3:      # Int64List (packed or repeated)
            out = []
            for f, w, v in _fields(val):
                if f != 1:
                    continue
                if w == _WIRE_LEN:
                    pos = 0
                    while pos < len(v):
                        x, pos = _read_varint(v, pos)
                        out.append(x - (1 << 64) if x >= (1 << 63) else x)
                else:
                    out.append(v - (1 << 64) if v >= (1 << 63) else v)
            return out
    return []


def parse_example(payload):
    """tf.train.Example bytes → {name: [values]}."""
    out = {}
    for field, _, features_buf in _fields(payload):
        if field != 1:          # Example.features
            continue
        for f, _, entry in _fields(features_buf):
            if f != 1:          # Features.feature map entry
                continue
            key = None
            value = []
            for ef, _, ev in _fields(entry):
                if ef == 1:
                    key = ev.decode("utf-8")
                elif ef == 2:
                    value = _parse_value_list(ev)
            if key is not None:
                out[key] = value
    return out


def read_records(path):
    """Iterate raw record payloads of a TFRecord file."""
    with open(path, "rb") as fd:
        data = fd.read()
    pos = 0
    n = len(data)
    while pos < n:
        if pos + 12 > n:
            raise ValueError(f"truncated TFRecord header in {path}")
        (length,) = struct.unpack_from("<Q", data, pos)
        start = pos + 12
        end = start + length
        if end + 4 > n:
            raise ValueError(f"truncated TFRecord payload in {path}")
        yield data[start:end]
        pos = end + 4


def count_records(path):
    return sum(1 for _ in read_records(path))


def load_tfrecord_columns(feature_map, path):
    """One TFRecord file → ``{name: ndarray}`` in loader column layout
    (int32 ids, float32 values; sequences as [N, max_len])."""
    wanted = dict(feature_map.features)
    rows = [parse_example(p) for p in read_records(path)]
    columns = {}
    for name, spec in wanted.items():
        t = spec["type"]
        if t == "sequence":
            L = spec["max_len"]
            arr = np.zeros((len(rows), L), np.int32)
            for i, r in enumerate(rows):
                v = r.get(name, [])[:L]
                arr[i, :len(v)] = v
            columns[name] = arr
        elif t in ("numeric", "embedding"):
            columns[name] = np.asarray(
                [r.get(name, [0.0])[0] if t == "numeric" else r.get(name, [])
                 for r in rows], np.float32)
        else:
            columns[name] = np.asarray(
                [int(r.get(name, [0])[0]) for r in rows], np.int32)
    for label in feature_map.labels:
        columns[label] = np.asarray([r.get(label, [0.0])[0] for r in rows],
                                    np.float32)
    return columns
