"""Manifest commit log behind a pluggable metadata store.

The engine's store (engine.py) separates DATA from METADATA exactly
like a table format (Delta/Iceberg): data files are immutable parquet
under ``data/<table>/c=<commit>/``, written and read by Spark (so an
``hdfs://`` / ``s3a://`` store path already works for data), and the
current state is ONE small JSON manifest mapping each graph to the
commit that serves it. Publishing a manifest is the commit point — the
reference's all-state-at-once RW lock (``primary_server.c:110-146``)
re-expressed as an atomic pointer swap.

This module is that metadata layer, extracted behind a four-call blob
interface (:class:`ManifestStore`) so the commit log itself is
deployment-agnostic:

- :class:`PosixManifestStore` — a local directory of manifest files.
  Put-if-absent is write-temp + ``os.link`` (hard-linking an existing
  name fails with EEXIST), so the published file is always complete
  AND creation is atomic-if-absent.
- :class:`HadoopFsManifestStore` — any Hadoop-supported filesystem
  (``hdfs://``, ``file:``, ``abfs://``, …) reached through Spark's
  JVM gateway, so the commit log can live NEXT TO the data on the
  same remote store the parquet tables already use.
- :class:`InMemoryManifestStore` — the object-store contract
  (S3/GCS conditional put, ``If-None-Match: *``) as executable
  documentation: a real bucket adapter only has to map the same four
  calls onto list/get/put-if-absent/delete API calls.

On either store, :class:`ManifestLog.commit` is an optimistic
compare-and-swap append: read the newest manifest, apply the caller's
pure update function, publish at ``seq+1`` with put-if-absent, and on
collision re-read and re-apply. That upgrades the engine from the
reference's single-writer assumption (one primary serializes writes)
to multi-writer safety: two concurrent writers both land, the loser
of the race re-merges onto the winner's manifest instead of
clobbering it.

The CAS key is the sequence number ALONE (``{seq:012d}.json``) — keying
by ``{seq}-{commit}.json`` would let two writers at the same seq with
different commit ids both "succeed" under different names, and the
lexicographically larger one would silently win. The commit id lives
inside the manifest document.
"""

from __future__ import annotations

import abc
import json
import math
import os
import re
import threading
import time
import uuid
from collections.abc import Callable

# Accepts both the current seq-only key and the legacy
# ``{seq:012d}-{cid}.json`` name so stores written by older code stay
# readable; new publishes always use the seq-only key.
_NAME_RE = re.compile(r"^(\d{12})(-[0-9a-f]+)?\.json$")


class CommitConflict(RuntimeError):
    """A CAS commit lost the publish race more times than the retry
    budget allows — the store is under pathological write contention."""


def manifest_name(seq: int) -> str:
    return f"{seq:012d}.json"


def parse_seq(name: str) -> int | None:
    """Sequence number encoded in a manifest file name, or None if the
    name is not a manifest (temp files, foreign junk)."""
    m = _NAME_RE.match(name)
    return int(m.group(1)) if m else None


class ManifestStore(abc.ABC):
    """Minimal blob surface the manifest log needs — the four calls
    every object store and every POSIX directory can provide."""

    @abc.abstractmethod
    def list(self) -> list[str]:
        """All blob names (unordered). An uninitialized store lists
        empty rather than raising — a virgin store is not an error."""

    @abc.abstractmethod
    def get(self, name: str) -> bytes:
        """Blob content; raises FileNotFoundError if absent."""

    @abc.abstractmethod
    def put_if_absent(self, name: str, data: bytes) -> bool:
        """Atomically create ``name`` with ``data`` iff it does not
        exist. True on success; False if the name already exists (the
        CAS failure arm). Readers must never observe partial content."""

    @abc.abstractmethod
    def delete(self, name: str) -> None:
        """Remove a blob; deleting an absent name is a no-op (vacuum
        races with itself harmlessly)."""


class PosixManifestStore(ManifestStore):
    """Directory-of-files store for local / NFS deployments."""

    def __init__(self, directory: str):
        self.directory = directory

    def list(self) -> list[str]:
        try:
            return os.listdir(self.directory)
        except FileNotFoundError:
            return []

    def get(self, name: str) -> bytes:
        with open(os.path.join(self.directory, name), "rb") as f:
            return f.read()

    def put_if_absent(self, name: str, data: bytes) -> bool:
        os.makedirs(self.directory, exist_ok=True)
        final = os.path.join(self.directory, name)
        # Land the full content under a unique temp name first, then
        # hard-link to the final name: link(2) fails with EEXIST if the
        # name is taken, and a reader can never open a half-written
        # manifest because the temp name never matches _NAME_RE.
        tmp = final + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "wb") as f:
            f.write(data)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, final)
            return True
        except FileExistsError:
            return False
        finally:
            os.unlink(tmp)

    def delete(self, name: str) -> None:
        try:
            os.remove(os.path.join(self.directory, name))
        except FileNotFoundError:
            pass


def _is_java_file_not_found(exc: Exception) -> bool:
    """True when a py4j-wrapped Java exception is a FileNotFoundException
    (any of the java.io / Hadoop flavors)."""
    je = getattr(exc, "java_exception", None)
    return je is not None and je.getClass().getName().endswith(
        "FileNotFoundException")


class HadoopFsManifestStore(ManifestStore):
    """Manifest store on any Hadoop-supported filesystem, reached via
    Spark's JVM gateway — the commit log lives on the SAME remote store
    (``hdfs://…/manifests``) as the parquet data dirs next to it.

    Put-if-absent lands the full content under a temp name (which never
    matches ``_NAME_RE``, so readers ignore it), then renames to the
    final name: ``FileSystem.rename`` is specified to fail (return
    False) when the destination exists, and is atomic on HDFS / ABFS /
    local filesystems. Object stores whose rename is a non-atomic
    copy+delete (plain S3A without conditional writes) should use a
    true conditional-put adapter instead — the
    :class:`InMemoryManifestStore` documents that contract.
    """

    def __init__(self, spark, directory: str):
        self.directory = directory
        try:
            self._jvm = spark._jvm
            hconf = spark._jsc.hadoopConfiguration()
        except Exception as exc:
            raise RuntimeError(
                "HadoopFsManifestStore needs a classic (JVM-gateway) "
                "SparkSession; a Spark Connect session cannot reach the "
                "Hadoop FileSystem API — pass an explicit ManifestStore "
                "(e.g. an object-store conditional-put adapter) to "
                "GraphEngine instead") from exc
        self._Path = self._jvm.org.apache.hadoop.fs.Path
        self._dir = self._Path(directory)
        self._fs = self._dir.getFileSystem(hconf)

    def _p(self, name: str):
        return self._Path(self._dir, name)

    def list(self) -> list[str]:
        try:
            statuses = self._fs.listStatus(self._dir)
        except Exception as exc:
            if _is_java_file_not_found(exc):
                return []
            raise
        return [s.getPath().getName() for s in statuses]

    def get(self, name: str) -> bytes:
        try:
            stream = self._fs.open(self._p(name))
        except Exception as exc:
            if _is_java_file_not_found(exc):
                raise FileNotFoundError(name) from None
            raise
        try:
            return bytes(self._jvm.org.apache.commons.io.IOUtils
                         .toByteArray(stream))
        finally:
            stream.close()

    def put_if_absent(self, name: str, data: bytes) -> bool:
        self._fs.mkdirs(self._dir)
        tmp = self._p(f"{name}.tmp-{uuid.uuid4().hex[:8]}")
        out = self._fs.create(tmp, False)
        try:
            out.write(bytearray(data))
        finally:
            out.close()
        if self._fs.rename(tmp, self._p(name)):
            return True
        self._fs.delete(tmp, False)
        return False

    def delete(self, name: str) -> None:
        # FileSystem.delete on an absent path returns False, no raise
        self._fs.delete(self._p(name), False)


def _s3_error_code(exc: Exception) -> str | None:
    """The service error code inside a botocore ``ClientError`` (or any
    exception shaped like one), else None."""
    resp = getattr(exc, "response", None)
    if isinstance(resp, dict):
        return (resp.get("Error") or {}).get("Code")
    return None


class S3ManifestStore(ManifestStore):
    """The commit log on S3 (or any S3-compatible endpoint) via REAL
    conditional put: ``PutObject`` with ``If-None-Match: *`` is an
    atomic create-if-absent on AWS S3 (GA since 2024), GCS's XML API,
    and MinIO — exactly the contract :class:`InMemoryManifestStore`
    documents, so plain-S3A's non-atomic rename is never needed for
    the commit point (the parquet DATA dirs still go through Spark's
    own s3a committer; only metadata publishes route here).

    boto3 is an OPTIONAL dependency: pass a pre-built ``client``
    (anything exposing ``put_object`` / ``get_object`` /
    ``delete_object`` / ``get_paginator("list_objects_v2")`` — a real
    boto3 client, or a fake in tests) to avoid importing it; with no
    client, boto3 is imported lazily and must be installed.

    Conflict mapping for the CAS loop: HTTP 412 (PreconditionFailed —
    the key exists) and HTTP 409 (ConditionalRequestConflict — a
    concurrent conditional write on the same key is in flight) both
    return False. For 409 the outcome of the competing write is
    unknown, but False is still correct: the commit loop re-reads the
    log and either merges onto the winner's manifest or retries the
    same seq, converging either way."""

    _LOST_RACE = ("PreconditionFailed", "ConditionalRequestConflict")
    _ABSENT = ("NoSuchKey", "404")

    def __init__(self, bucket: str, prefix: str = "", client=None):
        self.bucket = bucket
        self.prefix = prefix.strip("/")
        if self.prefix:
            self.prefix += "/"
        if client is None:
            try:
                import boto3
            except ImportError as exc:  # pragma: no cover - env-dependent
                raise ImportError(
                    "S3ManifestStore requires boto3 (or pass an explicit "
                    "client implementing put_object/get_object/"
                    "delete_object/list_objects_v2)") from exc
            client = boto3.client("s3")
        self.client = client

    def _key(self, name: str) -> str:
        return self.prefix + name

    def list(self) -> list[str]:
        out = []
        pages = self.client.get_paginator("list_objects_v2").paginate(
            Bucket=self.bucket, Prefix=self.prefix)
        for page in pages:
            for obj in page.get("Contents", []):
                out.append(obj["Key"][len(self.prefix):])
        return out

    def get(self, name: str) -> bytes:
        try:
            resp = self.client.get_object(Bucket=self.bucket,
                                          Key=self._key(name))
        except Exception as exc:
            if _s3_error_code(exc) in self._ABSENT:
                raise FileNotFoundError(name) from None
            raise
        body = resp["Body"]
        try:
            return body.read()
        finally:
            close = getattr(body, "close", None)
            if close:
                close()

    def put_if_absent(self, name: str, data: bytes) -> bool:
        try:
            self.client.put_object(Bucket=self.bucket, Key=self._key(name),
                                   Body=data, IfNoneMatch="*")
            return True
        except Exception as exc:
            if _s3_error_code(exc) in self._LOST_RACE:
                return False
            raise

    def delete(self, name: str) -> None:
        # S3 DeleteObject on an absent key is 204, already a no-op
        self.client.delete_object(Bucket=self.bucket, Key=self._key(name))


class InMemoryManifestStore(ManifestStore):
    """The object-store conditional-put contract, in memory: what an
    S3/GCS adapter must guarantee (atomic ``If-None-Match: *``),
    plus a test hook to interleave a competing commit at the worst
    possible moment."""

    def __init__(self):
        self._blobs: dict[str, bytes] = {}
        self._lock = threading.Lock()
        # Test hook: called (without the lock) before each put attempt —
        # a contention test injects a competing writer here.
        self.before_put: Callable[[str], None] | None = None

    def list(self) -> list[str]:
        with self._lock:
            return list(self._blobs)

    def get(self, name: str) -> bytes:
        with self._lock:
            try:
                return self._blobs[name]
            except KeyError:
                raise FileNotFoundError(name) from None

    def put_if_absent(self, name: str, data: bytes) -> bool:
        if self.before_put is not None:
            self.before_put(name)
        with self._lock:
            if name in self._blobs:
                return False
            self._blobs[name] = data
            return True

    def delete(self, name: str) -> None:
        with self._lock:
            self._blobs.pop(name, None)


def graph_bucket(name: str, buckets: int) -> int:
    """Stable bucket of a graph name: CRC-32 of the UTF-8 bytes mod
    ``buckets``. CRC-32 is the one hash that is BOTH driver-computable
    (zlib.crc32) and executor-computable (Spark's ``crc32`` builtin,
    java.util.zip.CRC32 — same standard polynomial), so partition
    pruning filters can be built as literals with no Spark job."""
    import zlib

    return zlib.crc32(name.encode("utf-8")) % buckets


class ManifestLog:
    """The commit log: versioned manifests over any ManifestStore.

    Two on-disk layouts, transparent to callers:

    - **Monolithic** (default): one JSON doc per seq holding the whole
      ``graphs`` map — right up to catalogs of ~10^5 graphs, after
      which every commit rewrites a multi-MB document.
    - **Chunked** (``chunk_buckets=B``): the ``graphs`` map is split
      into B bucket chunks (:func:`graph_bucket`), each an immutable
      content blob (``chunk-<uuid>.json``, a name :func:`parse_seq`
      ignores); the per-seq root doc stores only the chunk NAME per
      bucket plus commit metadata. A commit touching graphs in k
      buckets writes k new chunk blobs and reuses the previous names
      for the rest — so commit IO is O(touched buckets × N/B), not
      O(N), and no single document ever holds the whole catalog (the
      round-8 verdict's ~10^6-graph single-JSON-doc ceiling). Chunk
      blobs are immutable → cached by name across loads; vacuum
      deletes chunks no retained root references. The layout is
      decided by the FIRST published manifest and persists in the root
      doc (``chunk_buckets``); later log instances follow it
      regardless of their constructor argument.
    """

    def __init__(self, store: ManifestStore, buckets: int | None = None):
        self.store = store
        self.buckets = buckets
        self._chunk_cache: dict[str, dict] = {}

    # -- chunked layout internals ------------------------------------

    def _chunk(self, name: str) -> dict:
        """A chunk blob's graphs map, cached by name (immutable)."""
        got = self._chunk_cache.get(name)
        if got is None:
            got = json.loads(self.store.get(name))["graphs"]
            self._chunk_cache[name] = got
        return got

    def _assemble(self, doc: dict) -> dict:
        """A root doc in caller shape: chunked docs gain their full
        ``graphs`` map (chunk reads cached); monolithic docs pass
        through. ``chunks``/``buckets`` stay in the dict so a later
        commit can diff against the previous chunk set and writers can
        discover the store layout."""
        if "chunks" not in doc:
            return doc
        graphs: dict = {}
        for cname in doc["chunks"].values():
            graphs.update(self._chunk(cname))
        return {**doc, "graphs": graphs}

    def _encode(self, prev: dict | None, seq: int, body: dict) -> dict:
        """Root doc for ``body`` at ``seq``: monolithic, or chunked
        when the store's layout (first manifest wins, constructor arg
        seeds a virgin store) says so — only buckets whose content
        changed get a new chunk blob."""
        doc = {"seq": seq, **body}
        b = self.buckets if prev is None else prev.get("buckets")
        if not b:
            return doc
        graphs = doc.pop("graphs")
        per: list[dict] = [{} for _ in range(b)]
        for g, ptr in graphs.items():
            per[graph_bucket(g, b)][g] = ptr
        prev_chunks = (prev or {}).get("chunks", {})
        chunks: dict[str, str] = {}
        for i in range(b):
            old_name = prev_chunks.get(str(i))
            if old_name is not None and self._chunk(old_name) == per[i]:
                chunks[str(i)] = old_name  # untouched bucket: reuse
                continue
            name = f"chunk-{uuid.uuid4().hex[:12]}.json"
            ok = self.store.put_if_absent(
                name, json.dumps({"graphs": per[i]}).encode())
            assert ok, f"uuid chunk name collided: {name}"
            self._chunk_cache[name] = per[i]
            chunks[str(i)] = name
        doc.update(buckets=b, chunks=chunks, n_graphs=len(graphs))
        return doc

    def names(self) -> list[tuple[int, str]]:
        """Retained manifests as (seq, blob name), ascending by seq —
        the seq comes from the NAME, so listing the history never opens
        a single manifest."""
        out = []
        for n in self.store.list():
            seq = parse_seq(n)
            if seq is not None:
                out.append((seq, n))
        out.sort()
        return out

    def load(self, seq: int | None = None) -> dict | None:
        """Newest manifest, or the one with sequence ``seq`` for time
        travel. Returns None only for "no manifest yet" with no seq
        requested; an explicit seq that is not retained — including on
        a virgin store — raises FileNotFoundError (vacuumed or never
        published), never a silently-empty snapshot."""
        names = self.names()
        if seq is not None:
            hit = [n for s, n in names if s == seq]
            if not hit:
                raise FileNotFoundError(
                    f"no manifest with seq {seq} (vacuumed, or never "
                    f"published); retained history: "
                    f"{[s for s, _ in names] or 'none'}")
            return self._assemble(json.loads(self.store.get(hit[0])))
        if not names:
            return None
        return self._assemble(json.loads(self.store.get(names[-1][1])))

    def commit(self, update: Callable[[dict | None], dict | None],
               max_attempts: int = 50) -> dict | None:
        """Optimistic CAS append. ``update(prev_manifest)`` returns the
        next manifest body (``{"commit": cid, "graphs": {...}}``) or
        None to abort (nothing to publish). Must be a pure function of
        its argument: on a lost race it is re-applied to the winner's
        manifest, which is exactly how two concurrent writers merge
        instead of clobbering each other."""
        for _ in range(max_attempts):
            prev = self.load()
            body = update(prev)
            if body is None:
                return None
            seq = (prev["seq"] + 1) if prev else 1
            # commit timestamp, stamped at publish (never carried from
            # prev): what DESCRIBE HISTORY shows and TIMESTAMP AS OF
            # time travel resolves against. Clock skew across writers
            # makes ts-ordering advisory; seq stays the total order.
            # Truncated, not rounded, to the millisecond: round() can
            # round UP, making the stored ts postdate the publish
            # instant, so seq_at(t) with t sampled right after the
            # commit could miss it.
            body = {**body, "ts": math.floor(time.time() * 1000) / 1000}
            doc = self._encode(prev, seq, body)
            data = json.dumps(doc).encode()
            if self.store.put_if_absent(manifest_name(seq), data):
                return self._assemble(doc)
        raise CommitConflict(
            f"lost the manifest publish race {max_attempts} times")

    def vacuum(self, keep_last: int = 1) -> set[str]:
        """Drop all but the newest ``keep_last`` manifests; returns the
        set of commit ids the RETAINED manifests still reference (the
        live set the data-file vacuum must preserve). ``keep_last`` is
        the retention window that lets time travel and space
        reclamation coexist: seqs inside it stay pinnable."""
        if keep_last < 1:
            raise ValueError(f"keep_last must be >= 1, got {keep_last}")
        names = self.names()
        retained = names[-keep_last:]
        live = set()
        live_chunks: set[str] = set()
        dead_chunks: set[str] = set()
        for _, n in retained:
            doc = json.loads(self.store.get(n))
            live_chunks.update(doc.get("chunks", {}).values())
            for ptr in self._assemble(doc)["graphs"].values():
                # a pointer is one commit id (overwrite form) or an
                # append CHAIN (list) — every chained commit stays live
                live.update(ptr if isinstance(ptr, list) else [ptr])
        for _, n in names[:-keep_last]:
            # chunks referenced ONLY by roots being deleted are
            # provably dead (published history, no longer reachable);
            # this deliberately does NOT sweep never-referenced
            # chunk blobs — those are indistinguishable from a
            # concurrent commit's chunks written just before its root
            # publish (the in-flight-write problem, same as data
            # dirs). sweep_orphan_chunks reclaims them when the
            # caller KNOWS no write is in flight.
            dead_chunks.update(
                json.loads(self.store.get(n)).get("chunks", {}).values())
            self.store.delete(n)
        for n in dead_chunks - live_chunks:
            self.store.delete(n)
            self._chunk_cache.pop(n, None)
        return live

    def sweep_orphan_chunks(self) -> int:
        """Delete chunk blobs no retained root references — the
        leftovers of CAS-race losers and writers that died before
        publishing. ONLY safe when no commit is in flight (a
        mid-commit writer's chunks look identical); callers gate this
        exactly like the data-dir orphan sweep."""
        live_chunks: set[str] = set()
        for _, n in self.names():
            live_chunks.update(
                json.loads(self.store.get(n)).get("chunks", {}).values())
        removed = 0
        for n in self.store.list():
            if (n.startswith("chunk-") and n.endswith(".json")
                    and n not in live_chunks):
                self.store.delete(n)
                self._chunk_cache.pop(n, None)
                removed += 1
        return removed
