"""Batched FM-index primitives (JAX, TPU-first).

The reference walks the BWT one read at a time with prefetch games to hide
HBM latency (aligner_seed.cpp:624,884-912 interleaves a handful of state
machines; bt2_idx.h:382-421 SideLocus prefetch). On TPU the same latency
hiding is real vectorization: every op here carries a (B,) batch of search
states through a `lax.scan`, so each LF step is one batched row-gather from
the device-resident index plus 128-lane unpack/compare/sum work on the VPU.

Core math (classic FM index, = reference Ebwt::mapLF bt2_idx.h:2313):
    LF(i, c)  = fchr[c] + Occ(c, i)
    Occ(c, i) = #occurrences of c in bwt[0:i)
Occ is resolved as: checkpoint count for i's 128-base block (occ_cp row
gather) + in-block count from 8 uint32 words unpacked to 128 2-bit crumbs.
The sentinel row (z_off) stores a spurious 'A' which is subtracted when
(c == 0 and i > z_off) — same trick as the reference's $ handling.

Performance notes (measured on TPU v5e):
  * Row gathers MUST be `jnp.take(table2d, idx, axis=0)`. vmapped
    `dynamic_slice` lowers ~30x slower (954ms vs 32ms for a 384-step,
    2048-lane scan).
  * `lax.scan` costs ~0.1ms/step regardless of width, so states are batched
    as wide as possible and step counts kept minimal (seeds scan seed_len
    steps, SA walks scan 2^offrate steps).
  * Tiny tables (fchr, 5 entries) are reduced with masked sums, not gathers.

Row indices follow the index's row dtype (reference btypes.h 32/64-bit
switch): int32 for genomes below 2^31 joined bp, uint32 for the
".bt2l"-analog large mode up to 2^32 bp (covers GRCh38; TPUs have no native
int64 — XLA emulates it as int32 pairs, so uint32 keeps every LF step at
native width), int64 only past 4.29 Gbp. Kernels derive it via
FMHalf.row_dtype; mixed-dtype adds are cast explicitly because uint32+int32
would silently promote to (emulated) int64 under the x64 flag.
"""

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from bowtie2_tpu.constants import OCC_BLOCK, WORDS_PER_BLOCK
from bowtie2_tpu.index.fmindex import FMHalf

_LANE = jnp.arange(OCC_BLOCK, dtype=jnp.int32)
_CRUMB_SHIFTS = 2 * jnp.arange(16, dtype=jnp.uint32)
_CHARS4 = jnp.arange(4, dtype=jnp.int32)

# mesh axis name used by the sharded (> HBM) index mode: inside shard_map
# every index table holds only this device's block/rank range and gathers
# are owner-computes + psum over this axis (dist/sharded.py)
SHARD_AXIS = "shard"


def _take_sharded(table: jnp.ndarray, idx: jnp.ndarray, lo: jnp.ndarray
                  ) -> jnp.ndarray:
    """Owner-computes gather from a leading-axis-sharded table.

    table: this shard's rows (any trailing shape); idx: GLOBAL row ids
    (any shape); lo: (1,) this shard's first global row. Every device
    gathers its in-range rows (others contribute zeros) and a psum over
    SHARD_AXIS assembles the full answer — the TPU-native replacement for
    the reference's single-node shared-memory index (mm.h/shmem.h) once a
    genome no longer fits one chip's HBM."""
    loc = (idx - lo[0]).astype(jnp.int32)
    n_local = table.shape[0]
    inb = (loc >= 0) & (loc < n_local)
    rows = jnp.take(table, jnp.clip(loc, 0, n_local - 1), axis=0)
    mask = inb.reshape(inb.shape + (1,) * (rows.ndim - inb.ndim))
    rows = jnp.where(mask, rows, jnp.zeros((), rows.dtype))
    return jax.lax.psum(rows, SHARD_AXIS)


def _rows(half, table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather block rows: direct take on a replicated index, owner-computes
    + psum when `half` is a ShardedFMHalf (blk_lo present)."""
    lo = getattr(half, "blk_lo", None)
    if lo is None:
        return jnp.take(table, idx, axis=0)
    return _take_sharded(table, idx, lo)


def _take_offs(half, rank: jnp.ndarray) -> jnp.ndarray:
    lo = getattr(half, "off_lo", None)
    if lo is None:
        return jnp.take(half.offs, rank)
    return _take_sharded(half.offs, rank, lo)


def _occ_rows(half, block: jnp.ndarray
              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """ONE fused-row gather → (bwt words (B, 8) uint32, occ checkpoints
    (B, 4) row dtype). The [occ4|bwt8] row fusion exists for exactly this
    call: before it, every LF step paid two independent gathers."""
    rows = _rows(half, half.fm_blocks, block)                 # (B, 12)
    words = rows[:, :8]
    if half.occ_cp64 is not None:                             # >2^32 rows
        cps = _rows(half, half.occ_cp64, block)
    else:
        cps = rows[:, 8:12].astype(half.row_dtype)
    return words, cps


def _crumbs(block_rows: jnp.ndarray) -> jnp.ndarray:
    """(B, 8) uint32-pattern words → (B, 128) int32 2-bit crumbs."""
    B = block_rows.shape[0]
    w = block_rows.astype(jnp.uint32) if block_rows.dtype != jnp.uint32 \
        else block_rows
    c = (w[:, :, None] >> _CRUMB_SHIFTS[None, None, :]) & jnp.uint32(3)
    return c.reshape(B, OCC_BLOCK).astype(jnp.int32)


def _fchr_at(half: FMHalf, c: jnp.ndarray) -> jnp.ndarray:
    """fchr[c] for (B,) chars via masked sum (5-entry table)."""
    sel = (c[:, None] == _CHARS4[None, :])
    return jnp.sum(jnp.where(sel, half.fchr[None, :4],
                             jnp.zeros((), half.row_dtype)), axis=1,
                   dtype=half.row_dtype)


def occ_batch(half: FMHalf, i: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
    """#occurrences of per-state char c in bwt[0:i). i: (B,) row dtype;
    c: (B,) int32. Block count fits int32 for any realistic genome, so the
    gathers stay int32-indexed even in the int64 (large-index) mode."""
    block = (i // OCC_BLOCK).astype(jnp.int32)
    words, cps = _occ_rows(half, block)
    crumbs = _crumbs(words)
    pos = (i - block.astype(i.dtype) * OCC_BLOCK).astype(jnp.int32)
    inb = jnp.sum(((crumbs == c[:, None]) &
                   (_LANE[None, :] < pos[:, None])
                   ).astype(jnp.int32), axis=1, dtype=jnp.int32)
    cp = jnp.sum(jnp.where(c[:, None] == _CHARS4[None, :], cps,
                           jnp.zeros((), half.row_dtype)), axis=1,
                 dtype=half.row_dtype)
    corr = ((c == 0) & (i > half.z_off)).astype(jnp.int32)
    # explicit cast: uint32 rows + int32 counts would promote to int64
    # under x64 (large mode), silently re-introducing emulated 64-bit ops
    # in the hot loop; the wraparound cast is exact (result >= 0 mod 2^32)
    return cp + (inb - corr).astype(half.row_dtype)


def occ4_batch(half: FMHalf, i: jnp.ndarray) -> jnp.ndarray:
    """(B, 4) occurrence counts of every char in bwt[0:i). i: (B,)."""
    block = (i // OCC_BLOCK).astype(jnp.int32)
    words, cps = _occ_rows(half, block)
    crumbs = _crumbs(words)
    pos = (i - block.astype(i.dtype) * OCC_BLOCK).astype(jnp.int32)
    mask = _LANE[None, :] < pos[:, None]
    onehot = (crumbs[:, :, None] == _CHARS4[None, None, :])
    cnt = jnp.sum((onehot & mask[:, :, None]).astype(jnp.int32), axis=1,
                  dtype=jnp.int32)
    corr = jnp.where((_CHARS4[None, :] == 0) & (i > half.z_off)[:, None], 1, 0)
    return cps + (cnt - corr).astype(half.row_dtype)


def lf_batch(half: FMHalf, i: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
    """Batched LF mapping (reference mapLF). i, c: (B,)."""
    return _fchr_at(half, c) + occ_batch(half, i, c)


# scalar wrappers kept for tests / host poking (vmap-able, but slow path)
def occ(half: FMHalf, i: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
    return occ_batch(half, i[None] if i.ndim == 0 else i,
                     jnp.broadcast_to(c, (1,)) if c.ndim == 0 else c)[0]


def occ4(half: FMHalf, i: jnp.ndarray) -> jnp.ndarray:
    return occ4_batch(half, i[None])[0]


def lf(half: FMHalf, i: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
    return lf_batch(half, i[None], c[None])[0]


def ftab_lookup(half: FMHalf, key: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(top, bot) SA range of the K-mer with base-4 integer `key`."""
    pair = jax.lax.dynamic_slice(half.ftab, (2 * key + 1,), (2,))
    return pair[0], pair[1]


def ftab_lookup_batch(half: FMHalf, keys: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched ftab range lookup. keys: (B,) base-4 ints (first K chars)."""
    top = jnp.take(half.ftab, 2 * keys + 1)
    bot = jnp.take(half.ftab, 2 * keys + 2)
    return top, bot


# ----------------------------------------------------------------------
# Exact sweep: end-to-end backward search of the whole read, counting a
# lower bound on edits (reference SeedAligner::exactSweep aligner_seed.cpp:856).
# On range-empty: bump the edit count and restart from the full range at the
# next position. A read with nedit == 0 finishing with a nonempty range has
# exact end-to-end hits [top, bot).
# ----------------------------------------------------------------------

class SweepResult(NamedTuple):
    top: jnp.ndarray
    bot: jnp.ndarray
    nedit: jnp.ndarray   # lower bound on edits; 0 → [top,bot) are exact hits


@jax.jit
def exact_sweep(half: FMHalf, reads: jnp.ndarray, lengths: jnp.ndarray) -> SweepResult:
    """Batched exact sweep. reads: (B, Lmax) int32 codes (4=N); lengths: (B,)."""
    # right-to-left chars, aligned so column p holds read[length-1-p];
    # code 5 marks inactive steps (p >= length)
    B, Lmax = reads.shape
    pos = lengths[:, None] - 1 - jnp.arange(Lmax, dtype=jnp.int32)[None, :]
    rr = jnp.take_along_axis(reads, jnp.clip(pos, 0, Lmax - 1), axis=1)
    rr = jnp.where(pos >= 0, rr, 5)
    return exact_sweep_rr.__wrapped__(half, rr)


@jax.jit
def exact_sweep_rr(half: FMHalf, rr: jnp.ndarray) -> SweepResult:
    """exact_sweep on a pre-reversed char stream (rr[:, p] = read[len-1-p],
    5 = inactive). Callers that hold both orientations build rr with zero
    gathers: the reversed fw read is the complement of the rc read row."""
    B, Lmax = rr.shape
    rdt = half.row_dtype
    nrows = (half.n + 1).astype(rdt)

    def step(carry, c):
        top, bot, nedit = carry
        active = c < 5                          # padded steps are 5
        is_n = c >= 4
        cc = jnp.clip(c, 0, 3)
        fc = _fchr_at(half, cc)
        o2 = occ_batch(half, jnp.concatenate([top, bot]),
                       jnp.concatenate([cc, cc]))
        ntop = fc + o2[:B]
        nbot = fc + o2[B:]
        empty = (ntop >= nbot) | is_n
        top2 = jnp.where(empty, 0, ntop)
        bot2 = jnp.where(empty, nrows, nbot)
        nedit2 = nedit + jnp.where(empty, 1, 0)
        top = jnp.where(active, top2, top)
        bot = jnp.where(active, bot2, bot)
        nedit = jnp.where(active, nedit2, nedit)
        return (top, bot, nedit), None

    init = (jnp.zeros(B, rdt),
            jnp.broadcast_to(nrows, (B,)).astype(rdt),
            jnp.zeros(B, jnp.int32))
    (top, bot, nedit), _ = jax.lax.scan(step, init, rr.T)
    return SweepResult(top, bot, nedit)


# ----------------------------------------------------------------------
# Variable-length exact substring search: like exact_sweep but an empty
# range kills the state instead of restarting. Used for the pigeonhole
# half-read search that replaces the reference's up-front 1-mismatch search
# (SeedAligner::oneMmSearch aligner_seed.cpp:975): any end-to-end alignment
# with <= 1 edit has one exact half, so exact hits of both halves are a
# complete candidate generator for it (verification happens in the DP
# extension stage, which scores all edits anyway).
# ----------------------------------------------------------------------

@jax.jit
def substring_search(half: FMHalf, seqs: jnp.ndarray, lengths: jnp.ndarray
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Backward exact search of variable-length strings.

    seqs: (B, Lmax) int32 codes (4=N); lengths: (B,). Returns (top, bot);
    empty ranges have top >= bot.
    """
    B, Lmax = seqs.shape
    pos = lengths[:, None] - 1 - jnp.arange(Lmax, dtype=jnp.int32)[None, :]
    rr = jnp.take_along_axis(seqs, jnp.clip(pos, 0, Lmax - 1), axis=1)
    rr = jnp.where(pos >= 0, rr, 5)            # 5 = inactive (past length)
    return substring_search_rr.__wrapped__(half, rr)


@jax.jit
def substring_search_rr(half: FMHalf, rr: jnp.ndarray
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """substring_search on a pre-reversed stream (rr[:, p] = s[len-1-p],
    5 = inactive past the string's length)."""
    B, Lmax = rr.shape
    rdt = half.row_dtype
    nrows = (half.n + 1).astype(rdt)

    def step(carry, c):
        top, bot = carry
        active = c < 5
        is_n = c >= 4
        cc = jnp.clip(c, 0, 3)
        alive = top < bot
        fc = _fchr_at(half, cc)
        o2 = occ_batch(half, jnp.concatenate([top, bot]),
                       jnp.concatenate([cc, cc]))
        ntop = fc + o2[:B]
        nbot = fc + o2[B:]
        dead = is_n | ~alive
        ntop = jnp.where(dead, 1, ntop)
        nbot = jnp.where(dead, 0, nbot)
        top = jnp.where(active, ntop, top)
        bot = jnp.where(active, nbot, bot)
        return (top, bot), None

    init = (jnp.zeros(B, rdt),
            jnp.broadcast_to(nrows, (B,)).astype(rdt))
    (top, bot), _ = jax.lax.scan(step, init, rr.T)
    return top, jnp.maximum(top, bot)


# ----------------------------------------------------------------------
# Exact seed search: backward search of fixed-length seeds, no restart —
# empty range means no hit (reference searchSeedBi with -N 0,
# aligner_seed.cpp:1859; the exact case needs no bidirectional machinery).
# ----------------------------------------------------------------------

@partial(jax.jit, static_argnames=("seed_len", "ftab_chars"))
def seed_search_offsets(half: FMHalf, reads: jnp.ndarray, offs: jnp.ndarray,
                        valid: jnp.ndarray, seed_len: int,
                        ftab_chars: int = 0
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Extract seed windows on device, then batch-search them.

    reads: (B, Lmax) int32; offs: (B, smax) int32 window starts;
    valid: (B, smax) bool. Returns (top, bot) each (B*smax,). Windows
    containing N die in the search itself (no host-side N filtering).
    """
    B, smax = offs.shape
    Lmax = reads.shape[1]
    idx = jnp.minimum(offs[:, :, None]
                      + jnp.arange(seed_len, dtype=jnp.int32)[None, None, :],
                      Lmax - 1).reshape(B, smax * seed_len)
    seeds = jnp.take_along_axis(reads, idx, axis=1).reshape(-1, seed_len)
    return seed_search_exact.__wrapped__(half, seeds, valid.reshape(-1),
                                         seed_len, ftab_chars)


@partial(jax.jit, static_argnames=("seed_len", "ftab_chars"))
def seed_search_exact(half: FMHalf, seeds: jnp.ndarray, valid: jnp.ndarray,
                      seed_len: int, ftab_chars: int = 0
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched exact seed search. seeds: (B, seed_len); valid: (B,) bool.

    Returns (top, bot) each (B,); empty ranges have top == bot.
    With ftab_chars = K > 0 (and K <= seed_len), the last K seed chars are
    resolved with one ftab row lookup (reference ftabLoHi, bt2_idx.h:1476)
    and the scan runs only seed_len - K LF steps.
    """
    B = seeds.shape[0]
    rdt = half.row_dtype
    nrows = (half.n + 1).astype(rdt)

    def step(carry, c):
        top, bot = carry
        is_n = c >= 4
        cc = jnp.clip(c, 0, 3)
        alive = top < bot
        fc = _fchr_at(half, cc)
        o2 = occ_batch(half, jnp.concatenate([top, bot]),
                       jnp.concatenate([cc, cc]))
        ntop = fc + o2[:B]
        nbot = fc + o2[B:]
        dead = is_n | ~alive
        ntop = jnp.where(dead, 1, ntop)
        nbot = jnp.where(dead, 0, nbot)
        return (ntop, nbot), None

    K = ftab_chars
    if 0 < K <= seed_len:
        tail = seeds[:, seed_len - K:]
        has_n = (tail >= 4).any(axis=1)
        weights = (4 ** jnp.arange(K - 1, -1, -1, dtype=jnp.int32))
        key = jnp.sum(jnp.clip(tail, 0, 3) * weights[None, :], axis=1,
                      dtype=jnp.int32)
        top0, bot0 = ftab_lookup_batch(half, key)
        ok = valid & ~has_n
        init = (jnp.where(ok, top0, 1).astype(rdt),
                jnp.where(ok, bot0, 0).astype(rdt))
        rest = seeds[:, :seed_len - K]
        if rest.shape[1]:
            (top, bot), _ = jax.lax.scan(step, init, rest[:, ::-1].T)
        else:
            top, bot = init
    else:
        init = (jnp.zeros(B, rdt),
                jnp.where(valid, nrows, 0).astype(rdt))
        (top, bot), _ = jax.lax.scan(step, init, seeds[:, ::-1].T)
    return top, jnp.maximum(top, bot)


# ----------------------------------------------------------------------
# SA-offset resolution: walk rows leftward with LF until a marked row
# (reference GroupWalk2S/walkLeft, group_walk.h + bt2_idx.h:1607). Our index
# marks by text position (pos % 2^offrate == 0) so the walk is bounded by
# 2^offrate steps: a fixed-trip-count lax.scan, not a while loop.
# ----------------------------------------------------------------------

_BIT_SHIFTS = jnp.arange(32, dtype=jnp.uint32)


def _mark_rows(half: FMHalf, block: jnp.ndarray
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(B,) block ids → ((B, 128) int32 0/1 mark bits, (B,) int32 rank
    checkpoint) from ONE [bits4|rankcp] fused-row gather."""
    rows = _rows(half, half.mark_rows, block)                 # (B, 5)
    bits = (rows[:, :4, None] >> _BIT_SHIFTS[None, None, :]) & jnp.uint32(1)
    return (bits.reshape(-1, OCC_BLOCK).astype(jnp.int32),
            rows[:, 4].astype(jnp.int32))


@partial(jax.jit, static_argnames=("period",))
def sa_resolve(half: FMHalf, rows: jnp.ndarray, period: int = 32) -> jnp.ndarray:
    """Batched BWT row → joined text offset. rows: (B,) row dtype."""
    B = rows.shape[0]
    rdt = half.row_dtype
    rows = rows.astype(rdt)

    def step(carry, _):
        row, steps, done = carry
        block = (row // OCC_BLOCK).astype(jnp.int32)
        pos = (row - block.astype(rdt) * OCC_BLOCK).astype(jnp.int32)
        words, cps = _occ_rows(half, block)
        crumbs = _crumbs(words)                             # (B, 128)
        at = (_LANE[None, :] == pos[:, None])
        c = jnp.sum(jnp.where(at, crumbs, 0), axis=1,
                    dtype=jnp.int32)                        # bwt char at row
        mbits, _mcp = _mark_rows(half, block)
        marked = jnp.sum(jnp.where(at, mbits, 0), axis=1,
                         dtype=jnp.int32) == 1
        done_now = done | marked
        # occ(row, c) using the already-gathered block
        lt = _LANE[None, :] < pos[:, None]
        inb = jnp.sum(((crumbs == c[:, None]) & lt).astype(jnp.int32),
                      axis=1, dtype=jnp.int32)
        cp = jnp.sum(jnp.where(c[:, None] == _CHARS4[None, :], cps,
                               jnp.zeros((), rdt)), axis=1, dtype=rdt)
        corr = ((c == 0) & (row > half.z_off)).astype(jnp.int32)
        nrow = _fchr_at(half, c) + cp + (inb - corr).astype(rdt)
        row = jnp.where(done_now, row, nrow)
        steps = jnp.where(done_now, steps, steps + 1)
        return (row, steps, done_now), None

    (row, steps, _), _ = jax.lax.scan(
        step, (rows, jnp.zeros(B, jnp.int32), jnp.zeros(B, bool)),
        None, length=period)

    # rank of the marked row → offs[]
    block = (row // OCC_BLOCK).astype(jnp.int32)
    pos = (row - block.astype(rdt) * OCC_BLOCK).astype(jnp.int32)
    bits, mcp = _mark_rows(half, block)
    inb = jnp.sum(bits * (_LANE[None, :] < pos[:, None]), axis=1,
                  dtype=jnp.int32)
    rank = mcp + inb
    return _take_offs(half, rank) + steps.astype(rdt)
