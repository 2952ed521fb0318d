#!/usr/bin/env python3
"""Validate a graft-written .pth (torch zipfile serialization) WITHOUT
torch: a stub-torch Unpickler replays exactly the protocol torch.load
implements — find_class resolution of the torch globals, persistent_load
of ('storage', cls, key, 'cpu', numel) tuples, _rebuild_tensor_v2 —
then reconstructs the float32 tensors from the raw storage entries and
checks them against an expected description.

Usage: check_pth.py <file.pth> <expected.json>

expected.json: {"tensors": [{"shape": [..], "md5": "<md5 of the
row-major float32 LE bytes>"}, ...]}

Exit 0 iff the archive parses, the pickle unpickles through the stub,
shapes/strides/offsets are the contiguous ones, and every tensor's data
matches its md5.
"""
import hashlib
import io
import json
import pickle
import struct
import sys
import zipfile


class StubTensor:
    def __init__(self, storage_key, numel, offset, shape, stride):
        self.storage_key = storage_key
        self.numel = numel
        self.offset = offset
        self.shape = list(shape)
        self.stride = list(stride)


class StubTensorDataset:
    pass


class StubFloatStorage:
    pass


def _rebuild_tensor_v2(storage, offset, size, stride, requires_grad, hooks):
    key, numel = storage
    return StubTensor(key, numel, offset, size, stride)


class StubUnpickler(pickle.Unpickler):
    def find_class(self, module, name):
        table = {
            ("torch._utils", "_rebuild_tensor_v2"): _rebuild_tensor_v2,
            ("torch", "FloatStorage"): StubFloatStorage,
            ("torch.utils.data.dataset", "TensorDataset"): StubTensorDataset,
        }
        if (module, name) in table:
            return table[(module, name)]
        if (module, name) == ("collections", "OrderedDict"):
            import collections
            return collections.OrderedDict
        raise pickle.UnpicklingError(f"unexpected global {module}.{name}")

    def persistent_load(self, pid):
        assert isinstance(pid, tuple) and pid[0] == "storage", pid
        _, cls, key, location, numel = pid
        assert cls is StubFloatStorage, cls
        assert location == "cpu", location
        return (key, numel)


def main():
    path, expected_path = sys.argv[1], sys.argv[2]
    expected = json.loads(open(expected_path).read())["tensors"]
    zf = zipfile.ZipFile(path)
    names = zf.namelist()
    root = names[0].split("/")[0]
    assert f"{root}/data.pkl" in names, names
    assert f"{root}/version" in names, names
    # all entries STORED, like torch's own writer
    for info in zf.infolist():
        assert info.compress_type == zipfile.ZIP_STORED, (info.filename,
                                                          info.compress_type)
    obj = StubUnpickler(io.BytesIO(zf.read(f"{root}/data.pkl"))).load()
    assert isinstance(obj, StubTensorDataset), type(obj)
    tensors = obj.tensors
    assert isinstance(tensors, tuple), type(tensors)
    assert len(tensors) == len(expected), (len(tensors), len(expected))
    for i, (t, exp) in enumerate(zip(tensors, expected)):
        assert isinstance(t, StubTensor), type(t)
        assert t.shape == exp["shape"], (t.shape, exp["shape"])
        assert t.offset == 0, t.offset
        numel = 1
        contiguous = []
        for d in reversed(t.shape):
            contiguous.insert(0, numel)
            numel *= d
        assert t.stride == contiguous, (t.stride, contiguous)
        assert t.numel == numel, (t.numel, numel)
        data = zf.read(f"{root}/data/{t.storage_key}")
        assert len(data) == numel * 4, (len(data), numel * 4)
        got = hashlib.md5(data).hexdigest()
        assert got == exp["md5"], f"tensor {i}: md5 {got} != {exp['md5']}"
        # spot-decode to prove the bytes really are float32 LE
        struct.unpack("<%df" % numel, data)
    print(f"OK {path}: {len(tensors)} tensors")


if __name__ == "__main__":
    main()
