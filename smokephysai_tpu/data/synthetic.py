"""Synthetic smoke dataset: on-device batched episode generation.

Re-design of reference src/utils/data_loader.py:10-184. The reference
generates 800+200 episodes *serially* in Python, each stepping the simulator
20 times eagerly with a fresh 100-iteration Mandelbrot per step (SURVEY.md
§3.1 hot path). Here a whole chunk of episodes runs as ONE jitted program:
`vmap(simulate_episode)` — scan over time inside, vmap over episodes
outside — so the TPU sees a single fused batch-of-simulations kernel.

Source randomisation matches the reference's distributions
(data_loader.py:49-60): 1-3 sources (inactive slots masked, keeping shapes
static), positions uniform over [20, size-20), intensity U(0.5, 2.0).
The cache is a .npz of arrays instead of a pickle of torch tensors
(SURVEY.md §5 checkpoint/resume: 'array-native cache instead of pickle').
"""
from __future__ import annotations

import os
from typing import Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from smokephysai_tpu.physics.simulator import simulate_episode

Array = jnp.ndarray

MAX_SOURCES = 3  # reference data_loader.py:49 randint(1, 4)
SOURCE_MARGIN = 20  # reference data_loader.py:54-55
INTENSITY_RANGE = (0.5, 2.0)  # reference data_loader.py:56
FRAME_RANGE = (5, -5)  # reference data_loader.py:108 randint(5, T-5)


def _check_sequence_length(sequence_length: int) -> None:
    """The frame-sampling window [5, T-5) is empty for T <= 10. The
    reference fails loudly there (np.random.randint raises); jax randint
    does not, and the out-of-range frame+1 index would NaN-fill the target
    via take_along_axis — so fail loudly ourselves."""
    lo, hi = FRAME_RANGE[0], sequence_length + FRAME_RANGE[1]
    if hi <= lo:
        raise ValueError(
            f"sequence_length={sequence_length} leaves no valid input "
            f"frame in [{lo}, {hi}): need sequence_length > "
            f"{lo - FRAME_RANGE[1]} (reference data_loader.py:108)"
        )


def epoch_order_frames(
    key: Array, n: int, sequence_length: int, shuffle: bool
) -> Tuple[Array, Array]:
    """Episode visit order + per-episode input-frame draws for one epoch.

    This is the SINGLE source of epoch batch composition: the per-batch
    iterators (2D `_epoch_batches_sync`, 3D `epoch_batches`) and the fused
    whole-epoch programs (train/loop.py `make_train_epoch`/`make_eval_epoch`,
    which trace it inside jit) all call it with the same key, so a fused
    epoch sees bit-identical batches to the per-batch loop."""
    k_perm, k_frames = jax.random.split(key)
    order = jax.random.permutation(k_perm, n) if shuffle else jnp.arange(n)
    frames = jax.random.randint(
        k_frames, (n,), FRAME_RANGE[0], sequence_length + FRAME_RANGE[1]
    )
    return order, frames


def epoch_index_arrays(
    key: Array, n: int, batch_size: int, sequence_length: int, shuffle: bool
) -> Tuple[Array, Array]:
    """[num_full_batches, B] episode + frame index arrays for a fused epoch
    (the ragged tail is dropped, exactly like the shuffled per-batch path;
    validation callers handle the tail eagerly)."""
    order, frames = epoch_order_frames(key, n, sequence_length, shuffle)
    num_full = n // batch_size
    idx = order[: num_full * batch_size].reshape(num_full, batch_size)
    return idx, frames[idx]


def sample_source_params(
    key: Array, num_samples: int, grid_size: Tuple[int, int]
) -> Dict[str, Array]:
    """Random source configurations, distribution-matched to
    reference data_loader.py:49-60 (jax.random instead of np.random)."""
    h, w = grid_size
    k_n, k_x, k_y, k_i = jax.random.split(key, 4)
    num_sources = jax.random.randint(k_n, (num_samples,), 1, MAX_SOURCES + 1)
    xs = jax.random.randint(
        k_x, (num_samples, MAX_SOURCES), SOURCE_MARGIN, w - SOURCE_MARGIN
    ).astype(jnp.float32)
    ys = jax.random.randint(
        k_y, (num_samples, MAX_SOURCES), SOURCE_MARGIN, h - SOURCE_MARGIN
    ).astype(jnp.float32)
    intensity = jax.random.uniform(
        k_i, (num_samples, MAX_SOURCES), minval=INTENSITY_RANGE[0],
        maxval=INTENSITY_RANGE[1],
    )
    active = (
        jnp.arange(MAX_SOURCES)[None, :] < num_sources[:, None]
    ).astype(jnp.float32)
    return {
        "xy": jnp.stack([xs, ys], axis=-1),  # [N, 3, 2] (x, y)
        "intensity": intensity,
        "active": active,
    }


def generate_dataset(
    key: Array,
    num_samples: int,
    grid_size: Tuple[int, int] = (128, 128),
    sequence_length: int = 20,
    dt: float = 0.01,
    viscosity: float = 0.001,
    chunk_size: int = 64,
    use_pallas: bool = False,
    vorticity_eps: float = 0.0,
    mesh=None,
) -> Dict[str, np.ndarray]:
    """Generate `num_samples` episodes in vmapped chunks. Returns host
    arrays {sequences [N,T,H,W], chaos [N,3], source params}.

    With `mesh`, the episode axis is sharded over the 'data' mesh axis —
    embarrassingly parallel multi-chip generation (GSPMD splits the vmapped
    program; no collectives needed)."""
    params = sample_source_params(key, num_samples, grid_size)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        n_data = mesh.shape["data"]
        chunk_size = max(chunk_size, n_data)
        chunk_size -= chunk_size % n_data  # chunks divide the data axis
        sharding = NamedSharding(mesh, P("data"))
        # trailing ragged chunk stays unsharded (shape must divide the axis)
        place = lambda x: (
            jax.device_put(x, sharding) if x.shape[0] % n_data == 0 else x
        )
    else:
        place = lambda x: x

    episode = jax.jit(
        jax.vmap(
            lambda xy, inten, act: simulate_episode(
                xy,
                inten,
                act,
                grid_size=tuple(grid_size),
                num_steps=sequence_length,
                dt=dt,
                viscosity=viscosity,
                use_pallas=use_pallas,
                vorticity_eps=vorticity_eps,
            )
        )
    )

    seqs, labels = [], []
    for start in range(0, num_samples, chunk_size):
        end = min(start + chunk_size, num_samples)
        s, l = episode(
            place(params["xy"][start:end]),
            place(params["intensity"][start:end]),
            place(params["active"][start:end]),
        )
        seqs.append(np.asarray(s))
        labels.append(np.asarray(l))

    return {
        "sequences": np.concatenate(seqs),
        "chaos": np.concatenate(labels),
        "source_xy": np.asarray(params["xy"]),
        "source_intensity": np.asarray(params["intensity"]),
        "source_active": np.asarray(params["active"]),
    }


def gather_device_batch(
    sequences: Array,
    chaos: Array,
    continuity: Array,
    sample_idx: Array,
    frame_idx: Array,
    seq_f16: bool,
) -> Dict[str, Array]:
    """Pure on-device batch assembly from the dataset's device arrays.

    Shared by `SyntheticSmokeDataset.get_batch` (per-batch loop) and the
    fused whole-epoch programs (train/loop.make_train_epoch), which must
    take these arrays as jit ARGUMENTS: a traced function that closes over
    them instead embeds the entire dataset as StableHLO literal constants
    (measured: module bytes ≈ dataset bytes), and shipping a multi-GB
    module to a remote compile service stalls for tens of minutes."""
    seqs = sequences[sample_idx]  # [B, T, H, W]
    inp = jnp.take_along_axis(
        seqs, frame_idx[:, None, None, None], axis=1
    )[:, 0, :, :, None]
    tgt = jnp.take_along_axis(
        seqs, (frame_idx + 1)[:, None, None, None], axis=1
    )[:, 0, :, :, None]
    if seq_f16:
        # f16-storage path: frames back to f32, continuity from the
        # precomputed f32 constants (train/loop.py:157-162) instead
        # of the f16 sequence
        return {
            "input": inp.astype(jnp.float32),
            "target": tgt.astype(jnp.float32),
            "chaos_features": chaos[sample_idx],
            "continuity": continuity[sample_idx],
        }
    return {
        "input": inp,
        "target": tgt,
        "chaos_features": chaos[sample_idx],
        "sequence": seqs,
        "continuity": continuity[sample_idx],
    }


class SyntheticSmokeDataset:
    """Array-backed dataset with the reference's sampling semantics
    (reference data_loader.py:10-123): a sample is a random frame t in
    [5, T-5) as input, frame t+1 as target, the episode-averaged chaos
    label, and the full sequence (for the continuity loss, train.py:77)."""

    DEVICE_BYTES_LIMIT = 4e9  # sequences above this stay host-resident

    def __init__(
        self,
        num_samples: int = 1000,
        grid_size: Tuple[int, int] = (128, 128),
        sequence_length: int = 20,
        cache_path: Optional[str] = None,
        seed: int = 0,
        use_pallas: bool = False,
        vorticity_eps: float = 0.0,
    ):
        self.num_samples = num_samples
        self.grid_size = tuple(grid_size)
        self.sequence_length = sequence_length
        _check_sequence_length(sequence_length)

        if cache_path and os.path.exists(cache_path):
            with np.load(cache_path) as f:
                self.data = {k: f[k] for k in f.files}
            print(f"Loaded synthetic data from {cache_path}")
        else:
            self.data = generate_dataset(
                jax.random.PRNGKey(seed),
                num_samples,
                self.grid_size,
                sequence_length,
                use_pallas=use_pallas,
                vorticity_eps=vorticity_eps,
            )
            if cache_path:
                os.makedirs(os.path.dirname(cache_path) or ".", exist_ok=True)
                np.savez(cache_path, **self.data)
                print(f"Saved synthetic data to {cache_path}")

        # Device-resident copies give zero-copy batch assembly; beyond
        # ~4 GB (e.g. 800 episodes at 512^2 = 17 GB > v5e HBM) sequences
        # stay on host and batches ship only input/target frames. The
        # continuity loss term is a per-episode CONSTANT (it never sees
        # model outputs, reference physics_regularizer.py:26-35), so it is
        # precomputed here instead of shipping the full [B,T,H,W] sequence
        # with every step (168 MB/step at 512^2 through the tunnel).
        seqs = self.data["sequences"]
        fits_f32 = seqs.nbytes < self.DEVICE_BYTES_LIMIT
        # Sequences just over the f32 limit (the flagship 3200-episode 128^2
        # set is 4.19 GB) go on device as float16 storage: batch gathers cast
        # the two frames back to f32 and the continuity term uses the
        # precomputed f32 per-episode constants, so train-step numerics see
        # only the frame quantisation (~6e-4 absolute on O(1) densities,
        # ~1e-7 MSE — three orders below the 2e-3 model floor). This keeps
        # the quality recipe on the zero-copy device path instead of paying
        # ~28 ms/step of host-side tunnel dispatch.
        self._seq_f16 = (not fits_f32) and seqs.nbytes / 2 < self.DEVICE_BYTES_LIMIT
        self._on_device = fits_f32 or self._seq_f16
        self._sequences = (
            jnp.asarray(seqs, jnp.float16)
            if self._seq_f16
            else jnp.asarray(seqs) if self._on_device else seqs
        )
        continuity = (
            np.mean(np.abs(np.diff(seqs, axis=1)), axis=(1, 2, 3))
            if seqs.shape[1] > 1
            else np.zeros(seqs.shape[0], np.float32)
        )
        self._chaos = jnp.asarray(self.data["chaos"])
        self._continuity = jnp.asarray(continuity)
        # Host-resident batches index these with numpy — a device gather
        # per batch is one more tunnel RPC on the serving stream
        self._chaos_np = np.asarray(self.data["chaos"], np.float32)
        self._continuity_np = np.asarray(continuity, np.float32)

    def __len__(self) -> int:
        return self._sequences.shape[0]

    def device_arrays(self) -> Tuple[Array, Array, Array]:
        """(sequences, chaos, continuity) device arrays for the fused epoch
        programs — passed as jit arguments, never closed over (see
        gather_device_batch). On-device datasets only."""
        assert self._on_device, "host-resident dataset has no device arrays"
        return self._sequences, self._chaos, self._continuity

    def get_batch(self, sample_idx: Array, frame_idx: Array) -> Dict[str, Array]:
        """Assemble a batch from episode + frame indices. input/target are
        NHWC [B, H, W, 1]. Device-resident datasets also carry the full
        'sequence' (reference batch contract, data_loader.py:104-123);
        host-resident ones replace it with the precomputed per-episode
        'continuity' values."""
        if self._on_device:
            return gather_device_batch(
                self._sequences,
                self._chaos,
                self._continuity,
                sample_idx,
                frame_idx,
                self._seq_f16,
            )
        si = np.asarray(sample_idx)
        fi = np.asarray(frame_idx)
        # Pack input+target into ONE host->device transfer (half the RPCs
        # through the tunnel; measured neutral-to-positive — host-path step
        # overhead is dominated by per-op dispatch latency, not bytes).
        frames = np.stack(
            [self._sequences[si, fi], self._sequences[si, fi + 1]], axis=-1
        )  # [B, H, W, 2]
        frames = jnp.asarray(frames)
        # chaos/continuity: slice on HOST and ship (2 small H2D puts) rather
        # than gathering device copies — device gathers are execute RPCs
        # that serialize with the train step's own dispatches on the tunnel
        return {
            "input": frames[..., :1],
            "target": frames[..., 1:],
            "chaos_features": jnp.asarray(self._chaos_np[si]),
            "continuity": jnp.asarray(self._continuity_np[si]),
        }

    def stage_epoch(self, key: Array, batch_size: int) -> Dict[str, np.ndarray]:
        """Host-resident path: assemble ONE epoch's full batches on host as
        [num_batches, B, ...] numpy arrays (same `epoch_order_frames` draws
        as the per-batch loop, so batch composition is bit-identical).

        The per-batch host loop pays 3 H2D puts + 1 execute dispatch per
        batch through the tunnel (~36 ms/step over the compute floor,
        VERDICT r4 weak #6); staging lets fit() ship the whole epoch in one
        device_put — overlapped with the previous epoch's compute by a
        background thread — and run it as one fused scan
        (train/loop.make_train_epoch_staged): two RPCs per EPOCH instead of
        four per BATCH. An 800-episode 128^2 epoch stages ~105 MB."""
        assert not self._on_device, "device-resident datasets fuse directly"
        order, frames = epoch_order_frames(
            key, len(self), self.sequence_length, shuffle=True
        )
        order, frames = np.asarray(order), np.asarray(frames)
        nb = len(self) // batch_size
        si = order[: nb * batch_size].reshape(nb, batch_size)
        fi = frames[si]
        seqs = self._sequences  # host numpy [N, T, H, W]
        return {
            "input": seqs[si, fi][..., None],
            "target": seqs[si, fi + 1][..., None],
            "chaos_features": self._chaos_np[si],
            "continuity": self._continuity_np[si],
        }

    def sample_batch(self, key: Array, batch_size: int) -> Dict[str, Array]:
        """Random batch: episodes with replacement-free shuffle positions +
        random frame index per sample (reference __getitem__ semantics,
        data_loader.py:104-123)."""
        k1, k2 = jax.random.split(key)
        sample_idx = jax.random.randint(k1, (batch_size,), 0, len(self))
        frame_idx = jax.random.randint(
            k2, (batch_size,), FRAME_RANGE[0], self.sequence_length + FRAME_RANGE[1]
        )
        return self.get_batch(sample_idx, frame_idx)

    def epoch_batches(
        self, key: Array, batch_size: int, shuffle: bool = True
    ) -> Iterator[Dict[str, Array]]:
        """One pass over all episodes in batches (train: shuffled;
        val: in order, like the reference loaders data_loader.py:168-182).
        The trailing partial batch is dropped when shuffling (fixed shapes
        under jit) and kept for validation.

        Host-resident datasets (>DEVICE_BYTES_LIMIT) stage batches from a
        background prefetch thread so the numpy slicing + H2D transfer of
        batch t+1 overlaps the train step on batch t — the TPU-native
        analogue of the reference's DataLoader worker processes
        (data_loader.py:134-143). Batch contents and order are identical
        to the unprefetched path."""
        gen = self._epoch_batches_sync(key, batch_size, shuffle)
        if self._on_device:
            yield from gen  # zero-copy device gathers: nothing to overlap
            return
        yield from _prefetch(gen)

    def _epoch_batches_sync(
        self, key: Array, batch_size: int, shuffle: bool
    ) -> Iterator[Dict[str, Array]]:
        n = len(self)
        order, frames = epoch_order_frames(
            key, n, self.sequence_length, shuffle
        )
        if not self._on_device:
            # one readback per EPOCH: per-batch slicing of device-resident
            # index arrays was 2 execute RPCs per batch through the tunnel
            # (identical batch composition — same permutation/frame values)
            order, frames = np.asarray(order), np.asarray(frames)
        num_full = n // batch_size
        for b in range(num_full):
            idx = order[b * batch_size : (b + 1) * batch_size]
            yield self.get_batch(idx, frames[idx])
        if not shuffle and n % batch_size:
            idx = order[num_full * batch_size :]
            yield self.get_batch(idx, frames[idx])


def _prefetch(gen: Iterator, depth: int = 2) -> Iterator:
    """Stage up to `depth` items from `gen` in a daemon thread. The
    producer's numpy slicing and device transfers release the GIL, so
    staging overlaps the consumer's step dispatches. Exceptions propagate
    to the consumer. If the consumer abandons the iterator early
    (exception or break mid-epoch), the `stop` event unblocks the
    producer's timed put so the thread and its staged batches are
    released instead of leaking."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    stop = threading.Event()
    END = object()

    def _put(item) -> bool:
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            for item in gen:
                if not _put(item):
                    return
            _put(END)
        except BaseException as e:  # surface producer errors on the consumer
            _put(e)

    threading.Thread(target=worker, daemon=True).start()
    try:
        while True:
            item = q.get()
            if item is END:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()


def create_data_loaders(
    batch_size: int = 16,
    num_train: int = 800,
    num_val: int = 200,
    grid_size: Tuple[int, int] = (128, 128),
    cache_dir: Optional[str] = None,
    sequence_length: int = 20,
    seed: int = 0,
    use_pallas: bool = False,
    vorticity_eps: float = 0.0,
) -> Tuple[SyntheticSmokeDataset, SyntheticSmokeDataset]:
    """Train/val datasets with npz caching (reference
    data_loader.py:126-184; no worker processes needed — generation is one
    jitted program on the accelerator).

    `vorticity_eps` > 0 enables vorticity-confinement in the generating
    simulator (BASELINE configs[1], config_256_vorticity.yaml). Cache file
    names encode the generation parameters so configs with different grids /
    vorticity / sizes never collide in a shared cache_dir (the reference's
    single pickle name silently serves stale data, data_loader.py:145-150)."""

    def cache_path(split: str, n: int, s: int) -> Optional[str]:
        if not cache_dir:
            return None
        h, w = grid_size
        tag = f"{split}_{h}x{w}_T{sequence_length}_n{n}_s{s}"
        if vorticity_eps:
            tag += f"_vort{vorticity_eps:g}"
        return os.path.join(cache_dir, f"{tag}.npz")

    train = SyntheticSmokeDataset(
        num_samples=num_train,
        grid_size=grid_size,
        sequence_length=sequence_length,
        cache_path=cache_path("train", num_train, seed),
        seed=seed,
        use_pallas=use_pallas,
        vorticity_eps=vorticity_eps,
    )
    val = SyntheticSmokeDataset(
        num_samples=num_val,
        grid_size=grid_size,
        sequence_length=sequence_length,
        cache_path=cache_path("val", num_val, seed + 1),
        seed=seed + 1,
        use_pallas=use_pallas,
        vorticity_eps=vorticity_eps,
    )
    return train, val
