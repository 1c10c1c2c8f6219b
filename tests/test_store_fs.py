"""The store commit protocol is object-store-portable (r4 VERDICT
missing #2): every maintenance operation runs through the StoreFS seam
with RENAME FORBIDDEN on the store prefix — the semantics S3/GCS/ABFS
actually offer (LIST + atomic single-object PUT + DELETE, no move).

The mock filesystem implements ``put_atomic`` as a direct write (an
object-store PUT, not write-tmp-and-replace), and the fixture patches
``os.rename`` / ``os.replace`` / ``shutil.move`` to raise on any path
under the store — so a protocol regression that sneaks a rename back in
fails loudly.  (Spark's own parquet committer renames inside the JVM;
that layer is already pluggable per-store — S3A magic committer etc. —
and is out of scope for this seam, exactly like fastparquet's
``open_with`` hooks, writer.py:1192-1197, which cover the library's own
IO but not the OS.)
"""
import os
import shutil

import pytest
from pyspark.sql import functions as F

from parquet_python_spark.operators import fs as fs_mod
from parquet_python_spark.operators import pipeline as pl

pytestmark = pytest.mark.spark

COLS = ["doc_id", "text", "lang", "source", "n_chars",
        "repo", "path", "commit"]


def _docs(spark, lo, hi):
    return (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .where((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
            .withColumn("repo", (F.col("doc_id") % 5).cast("string"))
            .withColumn("path", F.col("doc_id").cast("string"))
            .withColumn("commit", F.lit("0")))


class ObjectStoreFS(fs_mod.LocalFS):
    """LocalFS with object-store PUT semantics: put_atomic writes the
    object directly (one PUT), never via a temp-file rename."""

    def put_atomic(self, path, data):
        p = fs_mod._strip_uri(path)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        with open(p, "wb") as f:
            f.write(data)


@pytest.fixture
def no_rename_store(tmp_path, monkeypatch):
    """A store root where ``os.rename``/``os.replace``/``shutil.move``
    raise, routed to the PUT-only mock FS."""
    root = str(tmp_path / "objstore")
    os.makedirs(root)

    def _forbid(fn):
        def guard(src, dst, *a, **kw):
            if str(src).startswith(root) or str(dst).startswith(root):
                raise AssertionError(
                    f"rename on object store: {src} -> {dst}")
            return fn(src, dst, *a, **kw)
        return guard

    monkeypatch.setattr(os, "rename", _forbid(os.rename))
    monkeypatch.setattr(os, "replace", _forbid(os.replace))
    monkeypatch.setattr(shutil, "move", _forbid(shutil.move))
    fs_mod.register_fs(root, ObjectStoreFS())
    yield root
    fs_mod.unregister_fs(root)


def test_full_maintenance_suite_without_rename(spark, no_rename_store,
                                               monkeypatch):
    """encode → append(+fold) → overwrite → remove → compact → sort →
    repair → merge, all on rename-forbidden semantics, ending with exact
    row fidelity and a duplicate-free combined lineage."""
    monkeypatch.setattr(pl, "LINEAGE_FOLD_FILES", 2)
    root = no_rename_store
    store = f"{root}/s"

    pl.run_encode(_docs(spark, 0, 200), store, columns=COLS,
                  target_rows=60, resume=False)
    # several appends: exceeds LINEAGE_FOLD_FILES -> pointer-commit fold
    for gen, (lo, hi) in enumerate([(200, 300), (300, 380), (380, 450)],
                                   start=1):
        pl.run_encode(_docs(spark, lo, hi), store, columns=COLS,
                      target_rows=60, resume=False, generation=gen)
    assert pl._read_lineage_ptr(store) is not None, "fold never triggered"

    # partition overwrite + repo removal (file-granular delta commit)
    repl = (_docs(spark, 0, 450).where(F.col("repo") == "3")
            .withColumn("n_chars", F.col("n_chars") + F.lit(7)))
    pl.overwrite_partitions(repl, store, columns=COLS, target_rows=60)
    pl.remove_repos(spark, store, ["4"])

    # compact + sort (affected_is_all commits) and crash repair
    pl.compact_store(spark, store, max_pages_per_column=1)
    pl.sort_store(spark, store, by=["doc_id"])
    pl.repair_lineage(spark, store)

    expected = (_docs(spark, 0, 450)
                .withColumn("n_chars",
                            F.when(F.col("repo") == "3",
                                   F.col("n_chars") + F.lit(7))
                            .otherwise(F.col("n_chars")))
                .where(F.col("repo") != "4")
                .select(*COLS))
    decoded = pl.decode_blocks(pl.read_blocks(spark, store))
    assert pl.verify_roundtrip(expected, decoded)["ok"]
    lin = pl.read_lineage(spark, store)
    assert lin.groupBy("part_key").count().where("count > 1").count() == 0
    assert pl.store_summary(spark, store)["rows"] == expected.count()

    # merge two stores into a third, still rename-free
    pl.run_encode(_docs(spark, 450, 500), f"{root}/t", columns=COLS,
                  target_rows=60, resume=False)
    out = pl.merge_stores(spark, [store, f"{root}/t"], f"{root}/m")
    assert out["rows"] == expected.count() + 50


def test_pointer_commit_uses_single_object_put(spark, no_rename_store):
    """The commit point is exactly one put_atomic of the pointer file."""
    root = no_rename_store
    store = f"{root}/s"
    puts = []

    class RecordingFS(ObjectStoreFS):
        def put_atomic(self, path, data):
            puts.append(path)
            super().put_atomic(path, data)

    fs_mod.register_fs(root, RecordingFS())
    pl.run_encode(_docs(spark, 0, 150), store, columns=["doc_id", "text"],
                  target_rows=50, resume=False)
    pl.repair_lineage(spark, store)
    assert puts and all(p.endswith(pl._LINEAGE_PTR) for p in puts)


class _FakeFsspec:
    """Duck-typed fsspec filesystem (dict-backed): exercises the FsspecFS
    adapter mapping without the optional package."""

    def __init__(self):
        self.objs = {}

    def ls(self, path, detail=False):
        path = path.rstrip("/")
        out, dirs = [], set()
        for k in self.objs:
            if k.startswith(path + "/"):
                rest = k[len(path) + 1:]
                if "/" in rest:
                    dirs.add(path + "/" + rest.split("/", 1)[0])
                else:
                    out.append({"name": k, "type": "file"})
        out += [{"name": d, "type": "directory"} for d in sorted(dirs)]
        if not out and path not in self.objs:
            raise FileNotFoundError(path)
        return out

    def exists(self, path):
        p = path.rstrip("/")
        return p in self.objs or any(k.startswith(p + "/") for k in self.objs)

    def cat_file(self, path):
        return self.objs[path]

    def pipe_file(self, path, data):
        self.objs[path] = data

    def rm_file(self, path):
        if path not in self.objs:
            raise FileNotFoundError(path)
        del self.objs[path]

    def rm(self, path, recursive=False):
        p = path.rstrip("/")
        hits = [k for k in self.objs if k == p or k.startswith(p + "/")]
        if not hits:
            raise FileNotFoundError(path)
        for k in hits:
            del self.objs[k]


def test_fsspec_adapter_contract():
    fake = _FakeFsspec()
    fs = fs_mod.FsspecFS(fs=fake)
    fs.put_atomic("bkt/store/lineage_ptr.json", b'{"epoch": 1}')
    fs.put_atomic("bkt/store/lineage/part-0001", b"x")
    fs.put_atomic("bkt/store/manifests/m-1/part-0000", b"y")
    assert fs.exists("bkt/store/lineage_ptr.json")
    assert fs.read_bytes("bkt/store/lineage_ptr.json") == b'{"epoch": 1}'
    assert fs.ls("bkt/store/lineage") == ["bkt/store/lineage/part-0001"]
    assert fs.ls_dirs("bkt/store/manifests") == ["bkt/store/manifests/m-1"]
    assert fs.ls("bkt/store/nope") == []         # missing dir -> empty
    fs.put_atomic("bkt/store/lineage_ptr.json", b'{"epoch": 2}')  # replace
    assert fs.read_bytes("bkt/store/lineage_ptr.json") == b'{"epoch": 2}'
    fs.delete("bkt/store/lineage/part-0001")
    fs.delete("bkt/store/lineage/part-0001")     # idempotent
    assert fs.ls("bkt/store/lineage") == []
    fs.delete_dir("bkt/store/manifests/m-1")
    fs.delete_dir("bkt/store/manifests/m-1")     # idempotent
    assert fs.ls_dirs("bkt/store/manifests") == []


def test_get_fs_longest_prefix_routing(tmp_path):
    a, b = fs_mod.FsspecFS(fs=_FakeFsspec()), fs_mod.FsspecFS(fs=_FakeFsspec())
    fs_mod.register_fs("/bkt", a)
    fs_mod.register_fs("/bkt/deep", b)
    try:
        assert fs_mod.get_fs("/bkt/x") is a
        assert fs_mod.get_fs("/bkt/deep/x") is b
        assert fs_mod.get_fs("file:///bkt/deep/x") is b  # URI stripped
        assert isinstance(fs_mod.get_fs(str(tmp_path)), fs_mod.LocalFS)
    finally:
        fs_mod.unregister_fs("/bkt")
        fs_mod.unregister_fs("/bkt/deep")


def test_concurrent_commit_fence(spark, tmp_path):
    """A pointer that moves while a manifest is being written must fail
    the in-flight commit loudly (silent last-writer-wins would drop the
    other committer's lineage) and leave the interloper's state intact."""
    import json

    store = str(tmp_path / "s")
    pl.run_encode(_docs(spark, 0, 200), store, columns=["doc_id", "text"],
                  target_rows=60, resume=False)
    pl.repair_lineage(spark, store)  # install a pointer (epoch 1)
    before = pl.store_summary(spark, store)

    class InterloperFS(fs_mod.LocalFS):
        """Advances the pointer underneath the committer the moment it
        checks the manifest _SUCCESS marker."""

        def exists(self, path):
            ok = super().exists(path)
            if ok and path.endswith("/_SUCCESS"):
                ptr = pl._read_lineage_ptr(store)
                ptr["epoch"] += 1
                super().put_atomic(f"{store}/{pl._LINEAGE_PTR}",
                                   json.dumps(ptr).encode())
            return ok

    fs_mod.register_fs(store, InterloperFS())
    try:
        with pytest.raises(RuntimeError, match="concurrent lineage commit"):
            pl.repair_lineage(spark, store)
    finally:
        fs_mod.unregister_fs(store)
    # the interloper's pointer survives; the failed commit's manifest dir
    # was cleaned up; the store still reads consistently
    assert pl._read_lineage_ptr(store)["epoch"] == 2
    assert pl.store_summary(spark, store) == before
