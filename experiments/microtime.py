"""Micro-timings of the host-loop's non-kernel stages at flagship scale.

Answers: where do pad=902ms / traverse=885ms-vs-398ms-kernel / shade=435ms
go at P=2M?  Each candidate op is jitted alone and fenced.

Run: python -u -c "import sys; sys.argv=['x']; exec(open('experiments/microtime.py').read())"
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

P = 2073600
P_FIX = 2097152


def timeit(name, fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[0:1])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[0:1])
    dt = (time.perf_counter() - t0) / n
    print(f"{name:<44s} {dt*1e3:8.2f} ms", flush=True)
    return out


def main():
    key = jax.random.PRNGKey(0)
    o = jax.random.normal(key, (P, 3), jnp.float32)
    d = jax.random.normal(jax.random.fold_in(key, 1), (P, 3), jnp.float32)
    act = jnp.ones((P,), bool)

    # 1. pad (P,3) -> (P_FIX,3)
    timeit("jnp.pad (P,3)->(P_FIX,3) x2",
           jax.jit(lambda a, b: (jnp.pad(a, ((0, P_FIX - P), (0, 0))),
                                 jnp.pad(b, ((0, P_FIX - P), (0, 0))))), o, d)

    # 2. column extraction: (P,3) -> 3 planes (P,)
    timeit("x[:,i] split to 3 planes",
           jax.jit(lambda a: tuple(a[:, i] for i in range(3))), o)

    # 3. full shatter: 2 arrays -> 6 planes reshaped (nc,128,8,128)
    def shatter(a, b):
        def s(x):
            return x.reshape(P_FIX // 131072, 128, 8, 128)
        ap = jnp.pad(a, ((0, P_FIX - P), (0, 0)))
        bp = jnp.pad(b, ((0, P_FIX - P), (0, 0)))
        return tuple(s(ap[:, i]) for i in range(3)) + tuple(
            s(1.0 / jnp.where(bp == 0, 1e-20, bp)[:, i]) for i in range(3))
    timeit("pad+shatter 2x(P,3) -> 6 planes", jax.jit(shatter), o, d)

    # 4. gather row-pack: the repack's (P,18) gather
    sel = jnp.argsort(jax.random.bits(key, (P,)).astype(jnp.int32))
    packed_src = jnp.concatenate([o, d, o, d, o, act[:, None].astype(jnp.float32),
                                  act[:, None].astype(jnp.float32),
                                  act[:, None].astype(jnp.float32)], axis=1)

    def repack(src, s):
        return src[s]
    timeit("(P,18)[perm] row gather", jax.jit(repack), packed_src, sel)

    # 5. argsort of small int key
    okt = (jax.random.bits(key, (P,)) % 9).astype(jnp.int32)
    timeit("argsort (P,) int32 stable",
           jax.jit(lambda k: jnp.argsort(k, stable=True)), okt)

    # 6. concat of 7 fields into (P,18) (repack pack side)
    def pack(a, b):
        return jnp.concatenate([a, b, a, b, a, b[:, :1], a[:, :1], b[:, :1]],
                               axis=1)
    timeit("concat -> (P,17)", jax.jit(pack), o, d)

    # 7. scatter-add flush: (P,3) at[ids].add
    full = jnp.zeros((P, 3), jnp.float32)
    ids = sel
    timeit("(P,3).at[(P,)ids].add",
           jax.jit(lambda f, i, r: f.at[i].add(r)), full, ids, o)

    # 8. one-row gather from (T,16) table (shade's tri_rows)
    table = jax.random.normal(key, (66052, 16), jnp.float32)
    tid = (jax.random.bits(key, (P,)) % 66052).astype(jnp.int32)
    timeit("(66k,16)[(P,)ids] row gather",
           jax.jit(lambda t, i: t[i]), table, tid)

    # 9. elementwise chain on (P,3) (30 ops, one program)
    def chain(a, b):
        x = a
        for _ in range(10):
            x = x * b + a
            x = jnp.where(x > 0, x, -x)
            x = x / (1.0 + jnp.abs(b))
        return x
    timeit("30-op elementwise chain (P,3)", jax.jit(chain), o, d)

    # 10. uniforms: threefry bounce_uniforms analog (P,6)
    pix = jnp.arange(P, dtype=jnp.int32)

    def uni(k, p):
        ks = jax.vmap(lambda q: jax.random.fold_in(k, q))(p)
        return jax.vmap(lambda q: jax.random.uniform(q, (6,)))(ks)
    from pathtracerwithcuda_tpu.ops import rng as rng_mod
    timeit("rng.bounce_uniforms (P,6)",
           jax.jit(lambda k, p: rng_mod.bounce_uniforms(k, 3, p)), key, pix)


main()
