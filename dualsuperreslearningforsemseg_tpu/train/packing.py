"""Small-parameter packing for the train step's jit boundary.

The DSRL train state is a pytree of ~1050 arrays, ~900 of which are tiny
f32 vectors (BatchNorm scale/shift/running stats, conv biases, and their
momentum buffers; 256-2048 elements each).  Passing each as its own jit
argument costs a fixed per-buffer toll every step: the compiled program
materializes small operands one async copy at a time (~2 us each on v5e —
latency, not bandwidth) and the host runtime marshals ~1050 buffer handles
per dispatch.  Traced on the stage-3 production step this tail was
~2.3 ms/step of device time (~800 copy-done ops of f32[256]/f32[1024]
clustered in the first fifth of the step), on a 52.6 ms step.

A micro-benchmark of the isolated boundary (900 donated f32 vector leaves +
one large tensor vs the same bytes packed into ONE buffer, identical SGD
math) measured 8.48 -> 3.01 ms/step.

So: pack every small f32 leaf into one flat buffer that PERSISTS across
steps.  Inside the program the leaves are rebuilt with static ``lax.slice``
reads (fused into their consumers) and the updated values are written back
through one ``concatenate`` (fused into the SGD update); autodiff still
differentiates the ordinary per-leaf pytree, so the model/optimizer HLO is
unchanged — only the program boundary narrows from ~1050 buffers to ~150.

Segments are padded to 1024-element multiples so every slice starts on a
full lane tile (an unaligned 1-D slice would re-tile — one copy per leaf,
which is the cost being removed).

The packing is transparent to callers: :class:`PackedTrainState` exposes
``.params`` / ``.batch_stats`` / ``.momentum`` properties that unpack on
demand (one jitted gather of slices, memoized per state object), so the
engine's checkpoint/eval/param-count paths read it exactly like the plain
:class:`~.steps.TrainState`.
"""

import os

import jax
import jax.numpy as jnp

_ALIGN = 1024  # elements; one f32 lane tile on TPU


class LeafPacker:
    """Partition a state pytree's leaves into packed-small vs big.

    Built from a concrete template state (shapes/dtypes fix the layout);
    ``pack_state``/``unpack`` then work on any state of the same structure,
    eagerly or under jit.  Only f32 leaves of at most ``threshold`` elements
    are packed; everything else passes through as-is.
    """

    def __init__(self, template_state, threshold: int = 4096):
        leaves, self.treedef = jax.tree_util.tree_flatten(template_state)
        self.threshold = threshold
        meta = []           # per leaf: ('p', offset, size, shape) | ('b', idx)
        offset = 0
        n_big = 0
        for leaf in leaves:
            if leaf.dtype == jnp.float32 and leaf.size <= threshold:
                meta.append(('p', offset, int(leaf.size), tuple(leaf.shape)))
                offset += -(-int(leaf.size) // _ALIGN) * _ALIGN
            else:
                meta.append(('b', n_big))
                n_big += 1
        self.meta = tuple(meta)
        self.packed_size = max(offset, _ALIGN)
        self.n_big = n_big

    def pack_state(self, state):
        """state pytree -> (packed f32 1-D, tuple of big leaves)."""
        leaves = jax.tree_util.tree_leaves(state)
        assert len(leaves) == len(self.meta), \
            'state has {} leaves, packer was built for {}'.format(
                len(leaves), len(self.meta))
        parts, bigs = [], []
        pos = 0
        for leaf, m in zip(leaves, self.meta):
            if m[0] == 'b':
                bigs.append(leaf)
                continue
            _, offset, size, _ = m
            # A packed leaf whose dtype/size drifted from the template would
            # otherwise be silently promoted by the concatenate and unpacked
            # at the template's dtype/shape (trace-time check only).
            assert leaf.dtype == jnp.float32 and int(leaf.size) == size, \
                'packed leaf drifted from template: got {}[{}], expected f32[{}]'.format(
                    leaf.dtype, int(leaf.size), size)
            if offset > pos:
                parts.append(jnp.zeros((offset - pos,), jnp.float32))
            parts.append(leaf.reshape(size))
            pos = offset + size
        if self.packed_size > pos:
            parts.append(jnp.zeros((self.packed_size - pos,), jnp.float32))
        return jnp.concatenate(parts), tuple(bigs)

    def unpack(self, packed, bigs):
        """(packed, bigs) -> state pytree (static slices; fuse into users)."""
        leaves = []
        for m in self.meta:
            if m[0] == 'b':
                leaves.append(bigs[m[1]])
                continue
            _, offset, size, shape = m
            leaves.append(jax.lax.slice(packed, (offset,),
                                        (offset + size,)).reshape(shape))
        return jax.tree_util.tree_unflatten(self.treedef, leaves)

    def host_unpack(self, packed_np, bigs_np):
        """NumPy twin of :meth:`unpack` for already-fetched host buffers.

        Checkpoint reads happen on the master rank only; launching the
        jitted unpack from a single process of a multi-process mesh would
        dispatch a computation on arrays whose devices other ranks own.
        Slicing the fetched buffer in numpy keeps master-only reads free of
        any device dispatch."""
        import numpy as np
        leaves = []
        for m in self.meta:
            if m[0] == 'b':
                leaves.append(bigs_np[m[1]])
                continue
            _, offset, size, shape = m
            leaves.append(np.asarray(packed_np[offset:offset + size])
                          .reshape(shape))
        return jax.tree_util.tree_unflatten(self.treedef, leaves)


class PackedTrainState:
    """Drop-in stand-in for :class:`~.steps.TrainState` whose small leaves
    live in one flat buffer.  Produced and consumed by the packed train step;
    ``.params``/``.batch_stats``/``.momentum`` unpack lazily (one jitted
    slice-gather, memoized) for checkpointing, eval, and tests."""

    __slots__ = ('packed', 'bigs', 'packer', '_unpacked')

    def __init__(self, packed, bigs, packer):
        self.packed = packed
        self.bigs = tuple(bigs)
        self.packer = packer
        self._unpacked = None

    def _state(self):
        if self._unpacked is None:
            if os.environ.get('DSRL_TPU_ASSERT_SPMD_UNPACK'):
                # Tripwire for the multi-process hazard (CLAUDE.md): in a
                # multi-process run NO code path should dispatch the jitted
                # unpack — a single rank doing so launches device work the
                # other ranks never join, and even an all-rank unpack is
                # unnecessary (device_get_state covers every legitimate
                # reader).  tests/test_cli_distributed.py runs the full
                # train+resume CLI flow with this set.
                if jax.process_count() > 1:
                    raise RuntimeError(
                        "PackedTrainState jitted unpack dispatched on rank "
                        "{} of a {}-process run (DSRL_TPU_ASSERT_SPMD_UNPACK "
                        "tripwire); use device_get_state() instead".format(
                            jax.process_index(), jax.process_count()))
            self._unpacked = _jitted_unpack(self.packer)(self.packed,
                                                         self.bigs)
        return self._unpacked

    @property
    def params(self):
        return self._state().params

    @property
    def batch_stats(self):
        return self._state().batch_stats

    @property
    def momentum(self):
        return self._state().momentum

    def device_get_state(self):
        """Host-side state via ONE fetch of (packed, bigs) + numpy slicing.

        The properties above unpack with a jitted program — fine inside the
        SPMD step flow, but a MASTER-ONLY caller (checkpoint autosave,
        final-weights export) must not launch device computations that the
        other ranks never join.  Fetching the fully-replicated buffers is
        legal from any single process; the rebuild is pure numpy.  Also the
        cheaper path: one transfer instead of ~900."""
        packed, bigs = jax.device_get((self.packed, self.bigs))
        return self.packer.host_unpack(packed, bigs)

    def tree_flatten(self):
        return (self.packed, self.bigs), self.packer

    @classmethod
    def tree_unflatten(cls, packer, children):
        packed, bigs = children
        return cls(packed, bigs, packer)


jax.tree_util.register_pytree_node(
    PackedTrainState,
    lambda s: s.tree_flatten(),
    PackedTrainState.tree_unflatten)


def _jitted_unpack(packer):
    """One compiled program that rebuilds the full pytree (callers unpack at
    most once per checkpoint/eval pass; eager per-leaf slicing would be ~900
    round-trips through the dispatch path)."""
    if not hasattr(packer, '_unpack_jit'):
        packer._unpack_jit = jax.jit(packer.unpack)
    return packer._unpack_jit


def pack_eval_state(params, batch_stats):
    """PackedTrainState for evaluation-only callers (benchmark command,
    bench.py): momentum is an empty dict, which packs to nothing and unpacks
    back to an empty dict, so no buffers are wasted on an unused optimizer."""
    from .steps import TrainState
    state = TrainState(params, batch_stats, {})
    packer = LeafPacker(state)
    packed, bigs = jax.jit(packer.pack_state)(state)
    return PackedTrainState(packed, bigs, packer)


def wrap_step_with_packing(core_step):
    """Wrap ``core_step(state, *args) -> (state', aux)`` so its jitted form
    carries the state packed across calls (donating the previous state).

    The first call may receive a plain TrainState (tests, engine startup):
    it is packed once, eagerly, and every subsequent step stays packed.
    Passing a PackedTrainState (i.e. the previous step's output) takes the
    fast path directly.
    """
    packer_box = {}

    def packed_core(pstate, *args):
        state = pstate.packer.unpack(pstate.packed, pstate.bigs)
        new_state, aux = core_step(state, *args)
        packed, bigs = pstate.packer.pack_state(new_state)
        return PackedTrainState(packed, bigs, pstate.packer), aux

    jitted = jax.jit(packed_core, donate_argnums=(0,))

    def ensure_packed(state):
        if isinstance(state, PackedTrainState):
            return state
        packer = packer_box.get('p')
        if packer is None:
            packer = packer_box['p'] = LeafPacker(state)
        pack_jit = packer_box.get('pack_jit')
        if pack_jit is None:  # memoized: a fresh wrapper per call would
            pack_jit = packer_box['pack_jit'] = jax.jit(packer.pack_state)
        packed, bigs = pack_jit(state)
        return PackedTrainState(packed, bigs, packer)

    def step(state, *args):
        return jitted(ensure_packed(state), *args)

    # jit-object passthroughs some callers rely on (bench.py counts the
    # step's XLA FLOPs via .lower().compile().cost_analysis()).
    step.lower = lambda state, *args: jitted.lower(ensure_packed(state), *args)
    step.ensure_packed = ensure_packed
    return step
