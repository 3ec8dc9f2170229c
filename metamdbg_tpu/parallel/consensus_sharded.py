"""Mesh-sharded consensus alignment (polishing at pod scale).

The windowed consensus aligner (kernels/consensus_jax.py) is embarrassingly
parallel over fragments: shard the fragment batch across the mesh's data
axis with `shard_map`, replicate the (small) window backbones, and
`psum`-reduce the per-window vote tables — votes are additive, so the
combined tables equal the single-chip result exactly.

Insertion events stay per-fragment (gathered on the host from each shard's
slice), matching the host decode path.
"""


import numpy as np


def vote_fragments_sharded(mesh, frags, frag_lens, backbones, win_of_frag,
                           offsets):
    """Like kernels.consensus_jax.vote_fragments_device but sharded over
    mesh axis "data". The fragment count must be a multiple of the mesh
    size (pad with empty fragments mapped to window 0)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    from ..kernels.consensus_jax import _voter

    n_dev = mesh.devices.size
    N, lf = frags.shape
    nw, lb = backbones.shape
    pad = (-N) % n_dev
    if pad:
        frags = np.concatenate([frags, np.full((pad, lf), 4, np.uint8)])
        frag_lens = np.concatenate([frag_lens, np.zeros(pad, frag_lens.dtype)])
        win_of_frag = np.concatenate([win_of_frag,
                                      np.zeros(pad, win_of_frag.dtype)])
        offsets = np.concatenate([offsets, np.zeros(pad, offsets.dtype)])

    voter = _voter(int(lf), int(lb), int(nw))

    def shard_fn(fr, fl, bb, wf, off):
        votes, ev_step, ev_attach, ev_fpos = voter(fr, fl, bb, wf, off)
        votes = jax.lax.psum(votes, "data")
        return votes, ev_step, ev_attach, ev_fpos

    fn = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P("data", None), P("data"), P(None, None), P("data"),
                  P("data")),
        out_specs=(P(), P("data", None), P("data", None), P("data", None)))

    votes, ev_step, ev_attach, ev_fpos = fn(
        jnp.asarray(frags), jnp.asarray(frag_lens), jnp.asarray(backbones),
        jnp.asarray(win_of_frag), jnp.asarray(offsets))

    votes = np.asarray(votes)
    ev_step = np.asarray(ev_step)[:N]
    ev_attach = np.asarray(ev_attach)[:N]
    ev_fpos = np.asarray(ev_fpos)[:N]

    from ..kernels.consensus_jax import decode_insertion_events
    ins_votes = decode_insertion_events(frags[:N], win_of_frag[:N], ev_step,
                                        ev_attach, ev_fpos, nw)
    return votes, ins_votes
