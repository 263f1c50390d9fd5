"""Small helpers shared by the stage drivers."""

from __future__ import annotations

import contextlib


def round_up(n: int, m: int) -> int:
    """Round n up to a multiple of the bucket size m."""
    return ((n + m - 1) // m) * m


def device_barrier(x) -> None:
    """Force completion of a device array. block_until_ready can return
    early over the remote-TPU tunnel (project gotcha); a 1-element
    device->host read is the reliable barrier."""
    import numpy as np

    import jax.numpy as jnp

    np.asarray(jnp.ravel(x)[:1])


def mesh_context(mesh):
    """`with mesh:` when a Mesh is given, else a no-op context."""
    return mesh if mesh is not None else contextlib.nullcontext()


def mesh_size(mesh) -> int:
    """Total device count of a Mesh (0 when mesh is None)."""
    if mesh is None:
        return 0
    import numpy as np

    return int(np.prod(mesh.devices.shape))


def pure_dp(mesh, b: int) -> bool:
    """True when the mesh is dp-only and batch b splits evenly over it —
    the admission rule for the shard_map planes (per-device Pallas
    kernels) in ar_stage and diffusion_stage: a pallas_call cannot be
    auto-partitioned by pjit, so multi-device kernels run one shard per
    device under shard_map, which needs every device on the dp axis."""
    n = mesh_size(mesh)
    dp = mesh.shape.get("dp", 1) if mesh is not None else 1
    return n > 1 and n == dp and b % dp == 0


def ensure_device(tree):
    """Move every numpy leaf of a param pytree onto the default device.

    jit re-uploads host-resident leaves on EVERY call; through the
    remote-TPU tunnel that costs seconds per stage invocation (e.g.
    ~0.6 s for the AR embedding tables, ~3 s for the diffusion weights).
    jnp.asarray on an already-committed device array is a no-op, so this
    is safe to call on each driver entry."""
    import jax
    import jax.numpy as jnp

    return jax.tree.map(jnp.asarray, tree)


_client_tokens: dict = {}


def backend_token() -> int:
    """Cache key component tying device-resident caches to the live
    backend: after jax.extend.backend.clear_backends() (the multichip
    dryrun does this) cached arrays are dead; a fresh monotonic token per
    client object makes lookups miss instead of returning them. Keyed by
    a weakref so a recycled id() of a freed client can't alias its token;
    tokens are never reused."""
    import weakref

    import jax

    client = jax.devices()[0].client
    key = id(client)
    entry = _client_tokens.get(key)
    if entry is not None:
        ref, token = entry
        if ref() is client:
            return token
    token = backend_token.counter = getattr(backend_token, "counter", 0) + 1
    try:
        ref = weakref.ref(client)
    except TypeError:
        # client type doesn't support weakrefs: hold it strongly so its
        # id can never be recycled while the token maps to it
        ref = (lambda c: (lambda: c))(client)
    _client_tokens[key] = (ref, token)
    return token


_cast_cache: dict = {}


def clear_cast_cache() -> None:
    """Drop every memoized cast tree (frees their device buffers once no
    other references remain). Benchmarks that measure several weight
    planes in one process call this between planes so the unused plane's
    HBM doesn't crowd out batch activations."""
    _cast_cache.clear()


_CAST_CACHE_MAX = 8  # distinct (tree, backend, plane) entries


def cached_cast(params, key, fn):
    """Memoize a param-tree transformation (dtype cast / int8 quantize)
    per (tree identity, backend, key): re-quantizing a few hundred MB of
    weights eagerly on every synthesize() call costs real wall time
    through the remote-TPU tunnel. The cached entry holds the original
    tree, so its id() can't be recycled while the entry is alive; the
    backend token invalidates entries after clear_backends.

    Bounded FIFO (oldest-inserted evicted past _CAST_CACHE_MAX): a
    long-lived serving process that reloads models or survives backend
    restarts would otherwise pin every superseded host tree AND its
    device cast buffers forever — hundreds of MB of HBM per stale
    entry."""
    full_key = (id(params), backend_token(), key)
    ent = _cast_cache.get(full_key)
    if ent is not None and ent[0] is params:
        return ent[1]
    out = fn(params)
    _cast_cache[full_key] = (params, out)
    while len(_cast_cache) > _CAST_CACHE_MAX:
        _cast_cache.pop(next(iter(_cast_cache)))  # dicts preserve order
    return out
