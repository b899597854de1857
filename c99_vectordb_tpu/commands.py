"""The five verbs: save / recall / analyze / clean / reindex.

Each command is stateless load -> mutate -> write over the two-file DB
(<base>.yaml source of truth, <base>.memo derived index) and reproduces
the reference CLI's stdout/stderr contract byte-for-byte
(/root/reference/memo_cli.py:308-693; /root/reference/SKILL.md:144-157):
results on stdout, `Error: ...` diagnostics and -v logs on stderr, exit
codes 0/1.

Compute deviations from the reference (all host-visible behavior equal):
  - embedding and search run as batched XLA programs (ops/, models/)
    instead of per-record FAISS calls — rebuilds embed the whole corpus
    in one device program.
  - the index is exact (Flat MXU matmul + top-k), so recall ranking is
    the true ascending-distance order rather than HNSW's approximation.
"""

from __future__ import annotations

import sys
from typing import Any

import numpy as np
import yaml

from .utils.runtime import configure_jax_cache, select_platform

from .constants import DIM, SCORE_SKIP_THRESHOLD
from .storage.paths import db_paths, ensure_parent
from .storage.yaml_store import RecordStore, block_str
from .utils.filters import matches, parse_filter
from .utils.reporting import default_fields, format_cell, render_stats, render_table, resolve_field
from .utils.text import is_blank_body

# The compute stack (jax + index families) imports lazily so jax-free
# verbs (analyze, clean, arg errors) skip ~1.5s of interpreter work; the
# persistent-cache config runs before the first jit either way.


def _compute_stack():
    configure_jax_cache()
    from .models.flat import FlatIndex  # noqa: F401 (registry side effect)
    from .ops.embed import embed_text, embed_texts
    from .storage.index_io import load_index_or_fresh, write_index

    return embed_text, embed_texts, load_index_or_fresh, write_index


def vlog(enabled: bool, msg: str) -> None:
    if enabled:
        print(msg, file=sys.stderr)


def _fail(msg: str) -> int:
    print(f"Error: {msg}", file=sys.stderr)
    return 1


def _load_store(yaml_path) -> RecordStore:
    return RecordStore.load(yaml_path)


def auto_nlist(corpus_size: int) -> int:
    """Corpus-size-aware IVF cell count when C99VDB_NLIST is unset.

    The measured guidance (BASELINE.md nlist sweep at 1M x 768): set
    nlist near the corpus's natural cluster count and spend extra probes,
    not extra cells; 4 * sqrt(N) rounded to a 128 multiple lands on the
    measured winner (4096 at 1M) and follows the FAISS 4-16 * sqrt(N)
    sizing rule. Clamped to [64, 8192] — beyond 8192 the 128-multiple
    list padding stops shrinking per-probe DMA while splitting true
    clusters (VERDICT round 2, weak #6)."""
    if corpus_size <= 4096:
        return 64  # memo scale: keep the small default
    raw = 4.0 * float(corpus_size) ** 0.5
    aligned = -(-int(raw) // 128) * 128
    return min(8192, aligned)


def make_index(corpus_size: int | None = None):
    """Build an empty index of the configured family.

    The CLI surface stays contract-identical regardless of family; the
    family is an engine choice via environment variables:
      C99VDB_INDEX  = flat (default) | ivf_flat | ivf_pq
                    | sharded_flat | sharded_ivf | sharded_ivf_pq
      C99VDB_NLIST / C99VDB_NPROBE / C99VDB_PQ_M / C99VDB_PQ_KSUB
      tune the IVF variants (ksub=16 = 4-bit nibble-packed codes).
    Sharded kinds build a data mesh over ALL visible devices (one chip ->
    a 1-device mesh; the same code scales to a pod slice unchanged).

    corpus_size (when the caller knows it, e.g. a full rebuild) sizes
    IVF's nlist via auto_nlist unless C99VDB_NLIST pins it explicitly.
    """
    import os

    kind = os.environ.get("C99VDB_INDEX", "flat").strip().lower()
    nlist_env = os.environ.get("C99VDB_NLIST", "").strip()
    if nlist_env:
        nlist = int(nlist_env)
    elif corpus_size is not None:
        nlist = auto_nlist(corpus_size)
    else:
        nlist = 64
    nprobe = int(os.environ.get("C99VDB_NPROBE", "8"))
    m = int(os.environ.get("C99VDB_PQ_M", "8"))
    ksub = int(os.environ.get("C99VDB_PQ_KSUB", "256"))
    if kind == "flat":
        from .models.flat import FlatIndex

        scan_dtype = os.environ.get("C99VDB_SCAN_DTYPE", "float32").strip() or "float32"
        return FlatIndex(dim=DIM, scan_dtype=scan_dtype)
    if kind == "ivf_flat":
        from .models.ivf_flat import IVFFlatIndex

        scan_dtype = os.environ.get("C99VDB_SCAN_DTYPE", "float32").strip() or "float32"
        rerank_dtype = (
            os.environ.get("C99VDB_RERANK_DTYPE", "float32").strip() or "float32"
        )
        pad_cap_env = os.environ.get("C99VDB_PAD_CAP", "").strip()
        return IVFFlatIndex(dim=DIM, nlist=nlist, nprobe=nprobe,
                            scan_dtype=scan_dtype, rerank_dtype=rerank_dtype,
                            pad_cap=int(pad_cap_env) if pad_cap_env else None)
    if kind == "ivf_pq":
        from .models.ivf_pq import IVFPQIndex

        opq = os.environ.get("C99VDB_OPQ", "").strip() not in ("", "0", "false")
        pad_cap_env = os.environ.get("C99VDB_PAD_CAP", "").strip()
        return IVFPQIndex(dim=DIM, nlist=nlist, nprobe=nprobe, m=m,
                          ksub=ksub, opq=opq,
                          pad_cap=int(pad_cap_env) if pad_cap_env else None)
    if kind == "sharded_flat":
        from .parallel.sharded import ShardedFlatIndex

        scan_dtype = os.environ.get("C99VDB_SCAN_DTYPE", "float32").strip() or "float32"
        return ShardedFlatIndex(dim=DIM, scan_dtype=scan_dtype)
    if kind == "sharded_ivf":
        from .parallel.sharded import ShardedIVFIndex

        scan_dtype = os.environ.get("C99VDB_SCAN_DTYPE", "float32").strip() or "float32"
        rerank_dtype = (
            os.environ.get("C99VDB_RERANK_DTYPE", "float32").strip() or "float32"
        )
        return ShardedIVFIndex(dim=DIM, nlist=nlist, nprobe=nprobe,
                               scan_dtype=scan_dtype, rerank_dtype=rerank_dtype)
    if kind == "sharded_ivf_pq":
        from .parallel.sharded import ShardedIVFPQIndex

        opq = os.environ.get("C99VDB_OPQ", "").strip() not in ("", "0", "false")
        return ShardedIVFPQIndex(dim=DIM, nlist=nlist, nprobe=nprobe, m=m,
                                 ksub=ksub, opq=opq)
    raise ValueError(f"unknown C99VDB_INDEX '{kind}'")


def build_index_from_store(bodies: list[str], verbose: bool):
    """Embed every non-blank body in ONE batched device program and build
    a fresh index (contrast: reference re-embeds in a Python loop,
    memo_cli.py:272-285)."""
    configure_jax_cache()
    from .ops.embed import embed_texts_device

    keep_ids = [i for i, body in enumerate(bodies) if not is_blank_body(body or "")]
    index = make_index(corpus_size=len(keep_ids))
    if keep_ids:
        # Device-resident: the (n, dim) f32 embedding never crosses the
        # host link (3 GB at 1M — hazard #3); train/add/_stage accept
        # jax.Array end-to-end (models/devbuild.py).
        vectors = embed_texts_device([bodies[i] for i in keep_ids])
        if hasattr(index, "train") and not getattr(index, "is_trained", True):
            index.train(vectors)
        index.add(vectors, np.asarray(keep_ids, dtype=np.int64))
    vlog(
        verbose,
        f"Rebuilt index with {len(keep_ids)} vectors "
        f"(skipped {len(bodies) - len(keep_ids)} blank records)",
    )
    if verbose and keep_ids and hasattr(index, "geometry_diagnostic"):
        # Corpus-geometry routing signal (devbuild.corpus_geometry):
        # heavy-tailed clustering caps IVF recall — surface the measured
        # guidance under -v (the default stderr contract stays silent).
        from .models.devbuild import geometry_advice

        advice = geometry_advice(index.geometry_diagnostic())
        if advice:
            vlog(verbose, f"Warning: {advice}")
    return index


# -- clean ---------------------------------------------------------------


def cmd_clean(db_base: str, user_cwd: str) -> int:
    index_path, yaml_path = db_paths(db_base, user_cwd)
    removed_any = False
    for p in (index_path, yaml_path):
        try:
            p.unlink()
            removed_any = True
        except FileNotFoundError:
            pass
        except OSError as e:
            return _fail(f"failed to remove {p}: {e}")
    # Derived snapshot sidecar (storage/snapshot.py): removed silently —
    # it does not exist in the reference's two-file model, so it never
    # appears in the verb's output either.
    from .storage.snapshot import snap_path

    try:
        snap_path(yaml_path).unlink(missing_ok=True)
    except OSError:
        pass

    verb = "Cleared memory database" if removed_any else "Database already empty"
    print(f"{verb} ({index_path}, {yaml_path})")
    return 0


# -- reindex ---------------------------------------------------------------


def cmd_reindex(db_base: str, user_cwd: str, verbose: bool) -> int:
    index_path, yaml_path = db_paths(db_base, user_cwd)
    try:
        store = _load_store(yaml_path)
    except Exception as e:
        return _fail(f"failed to load database YAML '{yaml_path}': {e}")

    compacted, dropped = store.compact()
    compacted.save(yaml_path)  # canonicalize formatting + persist re-sequenced ids

    select_platform(len(compacted))  # memo-scale -> CPU, corpus-scale -> TPU
    _, _, _, write_index = _compute_stack()
    index = build_index_from_store(compacted.bodies, verbose)
    ensure_parent(index_path)
    write_index(index, index_path)
    print(f"Rebuilt index from {yaml_path.name}")
    print(f"Wrote index: {index_path.name}")
    if dropped > 0:
        print(f"Compacted: dropped {dropped} blank/deleted entries")
    return 0


# -- save -------------------------------------------------------------------


def parse_save_input(path) -> list[dict[str, Any]]:
    """Validate the save input file: multi-doc YAML, each doc requiring a
    non-empty string `body`, optional map `metadata`, optional int `id`."""
    if not path.exists():
        raise ValueError(f"failed to read input file '{path}'")
    # libyaml C parser when present: identical typed results to SafeLoader
    # (same resolvers/constructors — see storage/yaml_store.py), ~8.5x
    # faster. At 1M save records the SafeLoader parse alone measured
    # ~5.4 min of the verb (benchmarks/cli_corpus_scale.py).
    loader = getattr(yaml, "CSafeLoader", yaml.SafeLoader)
    entries: list[dict[str, Any]] = []
    for doc in yaml.load_all(path.read_text(encoding="utf-8"), Loader=loader):
        if doc is None:
            continue
        if not isinstance(doc, dict):
            raise ValueError("each YAML document must be a mapping")
        if "body" not in doc:
            raise ValueError("each YAML document requires 'body'")
        body = doc.get("body")
        if not isinstance(body, str) or body.strip() == "":
            raise ValueError("body must be a non-empty string")
        metadata = doc.get("metadata")
        if metadata is not None and not isinstance(metadata, dict):
            raise ValueError("metadata must be a mapping when provided")
        entry: dict[str, Any] = {"body": body, "metadata": metadata}
        if "id" in doc:
            if not isinstance(doc["id"], int) or doc["id"] < 0:
                raise ValueError("id must be a non-negative integer when provided")
            entry["id"] = int(doc["id"])
        entries.append(entry)
    if not entries:
        raise ValueError("input YAML contains no entries")
    return entries


def cmd_save(db_base: str, input_file: str, user_cwd: str, verbose: bool) -> int:
    from pathlib import Path

    index_path, yaml_path = db_paths(db_base, user_cwd)
    try:
        entries = parse_save_input(Path(input_file))
    except ValueError as e:
        # Reference raises this uncaught (traceback); we report it cleanly.
        return _fail(str(e))

    try:
        store = _load_store(yaml_path)
    except Exception as e:
        return _fail(f"failed to load database YAML '{yaml_path}': {e}")

    select_platform(len(store) + len(entries))  # memo-scale -> CPU
    _, _, load_index_or_fresh, write_index = _compute_stack()
    index = load_index_or_fresh(
        index_path,
        dim=DIM,
        verbose_log=lambda m: vlog(verbose, m),
        fresh_factory=make_index,
    )
    existing_ids = set(int(i) for i in index.ids())
    had_overwrite = False
    appended: list[tuple[int, str]] = []

    for entry in entries:
        body = entry["body"]
        metadata = entry.get("metadata")
        override_id = entry.get("id")
        if override_id is not None:
            # Overwrite target must be a live indexed record (SURVEY.md §2.5 #5).
            if override_id >= len(store) or override_id not in existing_ids:
                return _fail(f"override id {override_id} does not exist")
            store.overwrite(override_id, body, metadata)
            had_overwrite = True
            print(f"Memorized: '{body}' (ID: {override_id})")
        else:
            new_id = store.append(body, metadata)
            appended.append((new_id, body))
            print(f"Memorized: '{body}' (ID: {new_id})")

    if had_overwrite:
        # Any overwrite invalidates stored vectors -> full batched rebuild.
        index = build_index_from_store(store.bodies, verbose)
    elif appended:
        # Device-resident (see build_index_from_store): a corpus-scale
        # first save funnels ALL records through this append path.
        from .ops.embed import embed_texts_device

        vectors = embed_texts_device([body for _, body in appended])
        index.add(vectors, np.asarray([rid for rid, _ in appended], dtype=np.int64))

    ensure_parent(index_path)
    write_index(index, index_path)
    store.save(yaml_path)
    return 0


# -- recall -------------------------------------------------------------------


def cmd_recall(
    db_base: str,
    query: str,
    k: int,
    filter_expr: str | None,
    as_yaml: bool,
    user_cwd: str,
    verbose: bool = False,
) -> int:
    from .utils.timing import stage

    index_path, yaml_path = db_paths(db_base, user_cwd)
    try:
        with stage(verbose, "load-yaml"):
            store = _load_store(yaml_path)
    except Exception as e:
        return _fail(f"failed to load database YAML '{yaml_path}': {e}")

    select_platform(len(store))  # memo-scale -> CPU, corpus-scale -> TPU
    embed_text, _, load_index_or_fresh, _ = _compute_stack()
    with stage(verbose, "load-index"):
        index = load_index_or_fresh(index_path, dim=DIM)

    return _recall_once(store, index, embed_text, query, k, filter_expr,
                        as_yaml, verbose)


def _recall_once(store, index, embed_text, query: str, k: int,
                 filter_expr: str | None, as_yaml: bool,
                 verbose: bool, *, ranked=None) -> int:
    """One recall against an ALREADY-LOADED store/index — shared by the
    one-shot verb (cmd_recall) and the resident-index serve loop
    (cmd_serve), so both produce byte-identical output per query.

    `ranked` optionally injects a precomputed device ranking handle
    (dists, ids, n) — serve's --batch mode ranks a whole batch of queries
    in ONE device program (index.ranked_many_device) and replays the rows
    through this display path, so batched output stays byte-identical."""
    from .utils.timing import stage

    if not as_yaml:
        print(f"Top {k} results:")
    if index.ntotal == 0:
        if as_yaml:
            print(yaml.safe_dump({"results": []}, sort_keys=False).strip())
        return 0

    # One device program: embed query -> score all rows -> full ranking
    # (the reference's k=ntotal exhaustive search, memo_cli.py:288-298).
    # The ranking SORT runs on device; the host only pulls doubling
    # O(k)-sized chunks of the sorted arrays as the display loop consumes
    # them (filter/blank misses widen into the next chunk) — at 1M
    # records the old full pull moved ~8 MB through a 1-30 MB/s link to
    # print k rows (VERDICT r3 next #5). Byte output is identical: the
    # chunks ARE the same sorted arrays.
    ranked_handle = ranked
    if ranked_handle is None:
        with stage(verbose, "embed+search"):
            q_vec = embed_text(query)
            ranked_dev = getattr(index, "ranked_all_device", None)
            if ranked_dev is not None:
                # None = the family has no device-streamable ranking for
                # this configuration (e.g. refine=False IVFPQIndex).
                ranked_handle = ranked_dev(q_vec)
            if ranked_handle is None:
                dists, ids = index.ranked_all(q_vec)

    active_filter: dict[str, Any] | None = None
    if filter_expr is not None:
        # Parse AFTER the header + search, like the reference
        # (memo_cli.py prints "Top k results:" before touching the
        # filter) — pinned by test_invalid_filter_after_header.
        try:
            active_filter = parse_filter(filter_expr)
        except Exception as e:
            return _fail(f"invalid --filter expression: {e}")

    def _ranked_pairs():
        """(dist, id) pairs in ranked order, pulled chunk-wise when the
        family supports device-resident rankings (full-pull otherwise)."""
        if ranked_handle is None:
            yield from zip(dists.tolist(), ids.tolist())
            return
        d_dev, i_dev, n = ranked_handle
        ofs = 0
        chunk = max(64, 4 * k)
        while ofs < n:
            step = min(chunk, n - ofs)
            d_np = np.asarray(d_dev[ofs : ofs + step])
            i_np = np.asarray(i_dev[ofs : ofs + step])
            pulled_rows[0] += step
            yield from zip(d_np.tolist(), i_np.tolist())
            ofs += step
            chunk *= 2

    pulled_rows = [0]

    shown = 0
    yaml_results: list[dict[str, Any]] = []
    for dist, doc_id in _ranked_pairs():
        if shown >= k:
            break
        if dist < SCORE_SKIP_THRESHOLD:  # vestigial parity branch, never true under L2
            continue
        if doc_id < 0 or doc_id >= len(store):
            continue
        if active_filter is not None:
            metadata = store.meta_at(doc_id) or {}
            # Post-filter: records without metadata never match (SURVEY.md §2.5 #6).
            if not metadata or not matches(metadata, active_filter):
                continue
        body = store.bodies[doc_id] or ""
        if is_blank_body(body):
            continue
        if as_yaml:
            yaml_results.append({"id": doc_id, "score": float(dist), "body": block_str(body)})
        else:
            print(f"  [{doc_id}] Score: {dist:.4f} |")
            for line in body.splitlines() or [""]:
                print(f"      {line}")
        shown += 1

    if ranked_handle is not None:
        vlog(
            verbose,
            f"recall ranking pulled {pulled_rows[0]}/{index.ntotal} rows "
            "host-side (chunked device ranking)",
        )
    if as_yaml:
        print(yaml.safe_dump({"results": yaml_results}, sort_keys=False).strip())
    return 0


def cmd_serve(
    db_base: str,
    k: int,
    filter_expr: str | None,
    as_yaml: bool,
    user_cwd: str,
    verbose: bool = False,
    batch: int = 1,
) -> int:
    """Resident-index recall loop — an EXTENSION verb (absent from the
    reference CLI surface, so absent from --help; documented in README):
    load the store + index ONCE, then answer one query per stdin line
    with the exact recall output block until EOF. Framing: plain blocks
    end with ONE EMPTY LINE (unambiguous — every in-block line is
    prefixed, even empty body lines render as 6 spaces); --yaml blocks
    end with a `...` line (YAML's explicit document-end marker, which
    cannot appear at column 0 inside the indented dump — an interior
    blank line CAN, for multi-paragraph bodies).

    Rationale (measured, BASELINE.md round 5): a fresh process per
    corpus-scale recall pays the full host->device push of the vector
    store every time (the push IS the verb: 34-57 s/process at 1M on
    this relay), while the resident index answers in ~90 ms. This is
    the CLI-reachable form of the MemoDB serving surface."""
    index_path, yaml_path = db_paths(db_base, user_cwd)
    try:
        store = _load_store(yaml_path)
    except Exception as e:
        return _fail(f"failed to load database YAML '{yaml_path}': {e}")

    if filter_expr is not None:
        # Fail fast at startup (extension verb — no per-query header
        # ordering to preserve): a bad filter would otherwise surface
        # only at the first query.
        try:
            parse_filter(filter_expr)
        except Exception as e:
            return _fail(f"invalid --filter expression: {e}")

    select_platform(len(store))  # memo-scale -> CPU, corpus-scale -> TPU
    embed_text, _, load_index_or_fresh, _ = _compute_stack()
    index = load_index_or_fresh(index_path, dim=DIM)
    vlog(verbose, f"serving {len(store)} records (resident index); "
                  "one query per line, EOF ends")

    def _stat_key(path):
        try:
            st = path.stat()
        except OSError:
            return None
        # st_ino included: writers publish via atomic rename (new inode
        # every write) while mtime_ns has kernel-tick granularity.
        return (st.st_mtime_ns, st.st_size, st.st_ino)

    served_state = (_stat_key(yaml_path), _stat_key(index_path))

    def _reload_if_changed() -> int:
        nonlocal store, index, served_state
        state = (_stat_key(yaml_path), _stat_key(index_path))
        if state != served_state:
            # An external writer (another memo process) republished the
            # DB: reload so answers reflect it — same stat-keyed
            # semantics as MemoDB's resident caches. The reload pays a
            # fresh device push; unchanged files cost two stat calls.
            try:
                store = _load_store(yaml_path)
            except Exception as e:
                return _fail(f"failed to load database YAML '{yaml_path}': {e}")
            index = load_index_or_fresh(index_path, dim=DIM)
            served_state = state
            vlog(verbose, f"reloaded {len(store)} records (DB files changed)")
        return 0

    if batch <= 1:
        for line in sys.stdin:
            query = line.strip()
            if not query:
                continue
            if _reload_if_changed() != 0:
                return 1
            _recall_once(store, index, embed_text, query, k, filter_expr,
                         as_yaml, verbose)
            # Block terminator for stream readers (see docstring).
            print("..." if as_yaml else "", flush=True)
        return 0

    # --batch N: queries accumulate until N are pending, a BLANK LINE
    # arrives (the explicit flush marker — blank lines are no-ops in
    # single-query mode, so the framing stays compatible), or EOF; each
    # flush embeds the whole batch in one device call and ranks it in ONE
    # device program (index.ranked_many_device), then replays every row
    # through the shared display path. Rationale (measured, BASELINE.md
    # round 5): a relay program dispatch costs ~90 ms regardless of work,
    # so per-query serving is dispatch-bound — batching is the lever.
    # The batch pads to the next power of two (repeating row 0) so the
    # number of distinct compiled batch shapes stays logarithmic.
    from .ops.embed import embed_texts

    pending: list[str] = []

    def _flush() -> int:
        if not pending:
            return 0
        if _reload_if_changed() != 0:
            return 1
        handles = None
        many = getattr(index, "ranked_many_device", None)
        if many is not None and index.ntotal > 0:
            q = embed_texts(pending)
            b = len(pending)
            b_pad = 1 << (b - 1).bit_length()
            if b_pad != b:
                q = np.concatenate([q, np.repeat(q[:1], b_pad - b, axis=0)])
            out = many(q)
            if out is not None:
                d_all, i_all, n = out
                handles = [(d_all[i], i_all[i], n) for i in range(b)]
        for qi, query in enumerate(pending):
            # No batched route (e.g. refine=False IVFPQIndex): fall back
            # to the per-query path — correct, just dispatch-bound.
            _recall_once(store, index, embed_text, query, k, filter_expr,
                         as_yaml, verbose,
                         ranked=None if handles is None else handles[qi])
            print("..." if as_yaml else "", flush=True)
        pending.clear()
        return 0

    for line in sys.stdin:
        query = line.strip()
        if not query:
            if _flush() != 0:
                return 1
            continue
        pending.append(query)
        if len(pending) >= batch:
            if _flush() != 0:
                return 1
    return _flush()


# -- analyze --------------------------------------------------------------------


def cmd_analyze(
    db_base: str,
    filter_expr: str,
    fields: list[str] | None,
    stats_key: str | None,
    limit: int,
    offset: int,
    user_cwd: str,
) -> int:
    if not filter_expr.strip():
        return _fail("analyze requires --filter <expr>")
    if limit < 1:
        return _fail("--limit must be >= 1")
    if offset < 0:
        return _fail("--offset must be >= 0")

    _, yaml_path = db_paths(db_base, user_cwd)
    try:
        store = _load_store(yaml_path)
    except Exception as e:
        return _fail(f"failed to load database YAML '{yaml_path}': {e}")

    try:
        active_filter = parse_filter(filter_expr)
    except Exception as e:
        return _fail(f"invalid --filter expression: {e}")

    # Metadata-only full scan — never touches the index or embeddings.
    found: list[tuple[int, dict[str, Any]]] = []
    for doc_id, _, metadata in store:
        metadata = metadata or {}
        if metadata and matches(metadata, active_filter):
            found.append((doc_id, metadata))

    print(f"Matched: {len(found)}")
    if stats_key is not None:
        for line in render_stats(found, stats_key):
            print(line)
        return 0

    selected = fields if fields else default_fields(found)
    if not selected:
        selected = ["id"]
    page = found[offset : offset + limit]
    rows = [
        [format_cell(resolve_field(doc_id, metadata, f)) for f in selected]
        for doc_id, metadata in page
    ]
    headers = ["ID" if f == "id" else f for f in selected]
    for line in render_table(headers, rows):
        print(line)
    return 0
