"""GOP sharding across hosts: the outermost parallel axis.

The reference has no distributed backend — its only cross-picture
parallelism is the thread-pool stage DAG (schroencoder.c:1979-2192).  On
TPU pods the natural outermost axis is GOPs-across-hosts over DCN
(SURVEY §2.3): every closed GOP (sequence header + I picture + its
P/B chain) is an independent unit of work — the bitstream is the
checkpoint, decoding can start at any sequence header — so hosts encode
disjoint GOP-aligned chunks concurrently and host 0 merges the payloads
and rewrites the parse-offset chain.

Shard execution:
  * single host: a thread per shard (JAX dispatch and the C++ entropy
    coder release the GIL, so shards overlap device and host work);
  * multi host: one chunk range per jax.distributed process, payload
    bytes gathered to every host with process_allgather (DCN), so the
    merged stream is available everywhere without a separate transport.

Byte-exactness: with content-adaptive state disabled across chunk
boundaries (scene-change scoring looks one frame back), the merged
stream is byte-identical to the serial encoder's output — tested in
tests/test_gop_sharding.py.
"""
from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Callable, List, Sequence, Tuple

from schroedinger_tpu import bitstream as bs


def chunk_ranges(n_frames: int, gop_length: int,
                 n_shards: int) -> List[Tuple[int, int]]:
    """Split [0, n_frames) into <= n_shards contiguous GOP-aligned ranges,
    balanced to within one GOP."""
    n_gops = -(-n_frames // gop_length)
    n_shards = max(1, min(n_shards, n_gops))
    per, extra = divmod(n_gops, n_shards)
    ranges = []
    g = 0
    for s in range(n_shards):
        take = per + (1 if s < extra else 0)
        start = g * gop_length
        stop = min((g + take) * gop_length, n_frames)
        if start < stop:
            ranges.append((start, stop))
        g += take
    return ranges


def _strip_units(stream: bytes) -> List[bytes]:
    """Re-split a shard stream into full parse units, dropping EOS."""
    units = []
    for code, payload in bs.split_units(stream):
        if code == bs.END_OF_SEQUENCE:
            continue
        units.append(b"BBCD" + bytes([code]) + b"\x00" * 8 + payload)
    return units


def merge_shard_streams(streams: Sequence[bytes]) -> bytes:
    """Concatenate per-shard streams into one valid Dirac stream: strips
    the shards' EOS units, rewrites the next/prev parse-offset chain
    across the whole sequence, and appends a single final EOS."""
    chain = bs.OffsetChain()
    out = bytearray()
    for s in streams:
        out += chain.add(_strip_units(s))
    out += chain.add([bs.make_eos_unit()], final_eos=True)
    return bytes(out)


def _validate_shard_encoder(enc, exact: bool = True) -> None:
    """exact=True: GOP sharding must be byte-exact vs the serial encode,
    which only the stateless fixed-qi IPPP configuration guarantees —
    scene change detection, CBR/quantiser engines, and the biref engine
    all carry cross-GOP state, so they are rejected up front.

    exact=False: any configuration is allowed — each chunk encodes as an
    independent self-contained sequence (fresh TM5 reservoir / engine
    state / scene-change history per chunk, the reference's quant_slot
    chain restarting at each chunk's first AU).  The merged stream is a
    valid CBR stream whose rate is held per chunk rather than across the
    whole sequence; it differs byte-wise from the serial encode exactly
    where that boundary state differs."""
    if not exact:
        return
    problems = []
    if getattr(enc, "enable_scene_change", False):
        problems.append("enable_scene_change")
    if getattr(enc, "rc", None) is not None:
        problems.append("bitrate/CBR")
    if getattr(enc, "qengine", None) is not None:
        problems.append("quantiser_engine")
    if getattr(enc, "gop_structure", "backref") != "backref":
        problems.append(f"gop_structure={enc.gop_structure}")
    if problems:
        raise ValueError(
            "Byte-exact GOP sharding requires a stateless fixed-qi IPPP "
            "encoder; unsupported options: " + ", ".join(problems)
            + " (pass exact=False for per-chunk-reservoir sharding)")


def _seed_shard_state(enc, start_frame: int) -> None:
    """Continue picture numbering and replicate the serial encoder's
    reference-retire counters at a GOP boundary: when the serial encoder
    reaches intra picture s it holds last_ref = s-1, prev_ref = s-2
    (IPPP; picture units include the field factor), and the opening intra
    retires prev_ref.  The shard encoder never touches those pictures'
    planes — only the numbers enter the bitstream — so seeding the
    counters makes the shard's units byte-identical to the serial ones."""
    ff = enc.field_factor
    s = start_frame * ff
    enc.frame_number = s
    if s >= 1:
        enc.last_ref = s - 1
    if s >= 2:
        enc.prev_ref = s - 2
    if s > 0:
        # stream-level aux units (codec comment/bitrate) belong to the
        # first shard only — the serial encoder emits them once
        enc._sent_stream_aux = True


def encode_gops_sharded(frames: Sequence, make_encoder: Callable[[], object],
                        n_shards: int, gop_length: int = None,
                        sequential: bool = False,
                        exact: bool = True) -> bytes:
    """Encode `frames` as n_shards independent GOP-aligned chunks.

    make_encoder() must return a fresh GopEncoder; its gop_length and
    field_factor are read off the first instance.  Picture numbering is
    made globally monotone by offsetting each shard's start number.
    Single-host form: shards run on a thread pool (sequential=True for
    deterministic debugging, the schroasync-none.c analog).
    exact=False allows CBR/engines/biref/scene-change configurations
    with per-chunk state (see _validate_shard_encoder).
    """
    proto = make_encoder()
    _validate_shard_encoder(proto, exact)
    gop_length = gop_length or proto.gop_length
    ranges = chunk_ranges(len(frames), gop_length, n_shards)

    def encode_one(rng_idx: int) -> bytes:
        start, stop = ranges[rng_idx]
        enc = proto if rng_idx == 0 else make_encoder()
        _seed_shard_state(enc, start)
        return enc.encode_stream(frames[start:stop])

    if sequential or len(ranges) == 1:
        shard_streams = [encode_one(i) for i in range(len(ranges))]
    else:
        with ThreadPoolExecutor(max_workers=len(ranges)) as ex:
            shard_streams = list(ex.map(encode_one, range(len(ranges))))
    return merge_shard_streams(shard_streams)


def encode_gops_multihost(frames: Sequence,
                          make_encoder: Callable[[], object],
                          gop_length: int = None,
                          shards_per_host: int = 1,
                          exact: bool = True) -> bytes:
    """Multi-host form: each jax.distributed process encodes its chunk
    range locally (shards_per_host threads), then the payload bytes are
    gathered to all hosts over DCN and merged.  Degenerates to
    encode_gops_sharded in a single-process run.  exact=False allows the
    flagship CBR tworef configuration with per-chunk reservoirs."""
    import jax

    n_proc = jax.process_count()
    if n_proc == 1:
        return encode_gops_sharded(frames, make_encoder,
                                   n_shards=shards_per_host,
                                   gop_length=gop_length, exact=exact)

    from jax.experimental import multihost_utils

    proto = make_encoder()
    _validate_shard_encoder(proto, exact)
    gop_length = gop_length or proto.gop_length
    ranges = chunk_ranges(len(frames), gop_length, n_proc)
    pidx = jax.process_index()
    if pidx < len(ranges):
        start, stop = ranges[pidx]
        enc = make_encoder()
        _seed_shard_state(enc, start)
        local = enc.encode_stream(frames[start:stop])
    else:
        local = b""
    return gather_and_merge(local, n_proc,
                            multihost_utils.process_allgather)


def gather_and_merge(local: bytes, n_proc: int, allgather) -> bytes:
    """DCN payload gather + byte-exact merge: variable-length shard
    streams travel as (length, zero-padded bytes) pairs through two
    allgathers, then the parse-offset chain is rewritten across the
    concatenation.  Split out so the padding/unpack logic is testable
    without a multi-process jax.distributed run."""
    import numpy as np

    lens = allgather(np.asarray([len(local)], np.int64))
    max_len = int(lens.max())
    buf = np.zeros(max_len, np.uint8)
    buf[:len(local)] = np.frombuffer(local, np.uint8)
    allbuf = allgather(buf)
    streams = [allbuf[i, :int(lens[i, 0])].tobytes()
               for i in range(n_proc) if int(lens[i, 0])]
    return merge_shard_streams(streams)
