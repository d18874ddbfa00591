"""AoS (N,3) vs SoA 3x(N,) for a representative shading chain on TPU."""
import time
import jax, jax.numpy as jnp

N = 1 << 20
ITERS = 20
key = jax.random.PRNGKey(0)
ks = jax.random.split(key, 8)
mk = lambda i: jax.random.normal(ks[i], (N, 3), jnp.float32)
wo, ns, ng, tg, wi = mk(0), mk(1), mk(2), mk(3), mk(4)
u = jax.random.uniform(ks[5], (N,))

def timed(name, fn, *args):
    f = jax.jit(fn)
    r = jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(3):
        r = jax.block_until_ready(f(*args))
    print(f"{name:28s} {(time.perf_counter()-t0)/3/ITERS*1e3:7.3f} ms/chain")

# --- AoS chain: normalize, frame build, to_local, dots, validate, to_world
def dot(a, b): return jnp.sum(a * b, axis=-1)
def normalize(v): return v * jax.lax.rsqrt(jnp.maximum(dot(v, v), 1e-20))[..., None]
def cross(a, b): return jnp.cross(a, b)

def aos_chain(wo, ns, ng, tg, wi, u):
    def body(i, acc):
        n = normalize(ns + acc[..., None] * 1e-7)
        s = normalize(tg - n * dot(tg, n)[..., None])
        t = cross(n, s)
        wol = jnp.stack([dot(wo, s), dot(wo, t), dot(wo, n)], -1)
        wil = jnp.stack([dot(wi, s), dot(wi, t), dot(wi, n)], -1)
        cos_i = jnp.abs(wil[..., 2])
        f = cos_i * jnp.maximum(wol[..., 2], 0.0) * (1.0 / 3.14159)
        refl = (dot(wo, ng) * dot(wi, ng) > 0) == ((wol[..., 2] * wil[..., 2]) > 0)
        f = jnp.where(refl, f, 0.0)
        wiw = s * wil[..., :1] + t * wil[..., 1:2] + n * wil[..., 2:]
        return acc + f + dot(wiw, wo) * u
    return jax.lax.fori_loop(0, ITERS, body, jnp.zeros(N))

timed("AoS (N,3)", aos_chain, wo, ns, ng, tg, wi, u)

# --- SoA chain: identical math on component arrays
def soa(v): return v[:, 0], v[:, 1], v[:, 2]
def sdot(a, b): return a[0]*b[0] + a[1]*b[1] + a[2]*b[2]
def snorm(v):
    r = jax.lax.rsqrt(jnp.maximum(sdot(v, v), 1e-20))
    return (v[0]*r, v[1]*r, v[2]*r)
def scross(a, b):
    return (a[1]*b[2]-a[2]*b[1], a[2]*b[0]-a[0]*b[2], a[0]*b[1]-a[1]*b[0])

def soa_chain(wo, ns, ng, tg, wi, u):
    wo_, ns_, ng_, tg_, wi_ = soa(wo), soa(ns), soa(ng), soa(tg), soa(wi)
    def body(i, acc):
        n = snorm((ns_[0] + acc*1e-7, ns_[1] + acc*1e-7, ns_[2] + acc*1e-7))
        d = sdot(tg_, n)
        s = snorm((tg_[0]-n[0]*d, tg_[1]-n[1]*d, tg_[2]-n[2]*d))
        t = scross(n, s)
        wol = (sdot(wo_, s), sdot(wo_, t), sdot(wo_, n))
        wil = (sdot(wi_, s), sdot(wi_, t), sdot(wi_, n))
        cos_i = jnp.abs(wil[2])
        f = cos_i * jnp.maximum(wol[2], 0.0) * (1.0 / 3.14159)
        refl = (sdot(wo_, ng_) * sdot(wi_, ng_) > 0) == ((wol[2] * wil[2]) > 0)
        f = jnp.where(refl, f, 0.0)
        wiw = (s[0]*wil[0]+t[0]*wil[1]+n[0]*wil[2],
               s[1]*wil[0]+t[1]*wil[1]+n[1]*wil[2],
               s[2]*wil[0]+t[2]*wil[1]+n[2]*wil[2])
        return acc + f + sdot(wiw, wo_) * u
    return jax.lax.fori_loop(0, ITERS, body, jnp.zeros(N))

timed("SoA 3x(N,)", soa_chain, wo, ns, ng, tg, wi, u)

# --- SoA with inputs already component arrays (no slicing cost)
wox, woy, woz = wo[:, 0], wo[:, 1], wo[:, 2]
nsx, nsy, nsz = ns[:, 0], ns[:, 1], ns[:, 2]
ngx, ngy, ngz = ng[:, 0], ng[:, 1], ng[:, 2]
tgx, tgy, tgz = tg[:, 0], tg[:, 1], tg[:, 2]
wix, wiy, wiz = wi[:, 0], wi[:, 1], wi[:, 2]
def soa_chain2(wox, woy, woz, nsx, nsy, nsz, ngx, ngy, ngz, tgx, tgy, tgz, wix, wiy, wiz, u):
    wo_, ns_, ng_, tg_, wi_ = (wox,woy,woz),(nsx,nsy,nsz),(ngx,ngy,ngz),(tgx,tgy,tgz),(wix,wiy,wiz)
    def body(i, acc):
        n = snorm((ns_[0] + acc*1e-7, ns_[1] + acc*1e-7, ns_[2] + acc*1e-7))
        d = sdot(tg_, n)
        s = snorm((tg_[0]-n[0]*d, tg_[1]-n[1]*d, tg_[2]-n[2]*d))
        t = scross(n, s)
        wol = (sdot(wo_, s), sdot(wo_, t), sdot(wo_, n))
        wil = (sdot(wi_, s), sdot(wi_, t), sdot(wi_, n))
        cos_i = jnp.abs(wil[2])
        f = cos_i * jnp.maximum(wol[2], 0.0) * (1.0 / 3.14159)
        refl = (sdot(wo_, ng_) * sdot(wi_, ng_) > 0) == ((wol[2] * wil[2]) > 0)
        f = jnp.where(refl, f, 0.0)
        wiw = (s[0]*wil[0]+t[0]*wil[1]+n[0]*wil[2],
               s[1]*wil[0]+t[1]*wil[1]+n[1]*wil[2],
               s[2]*wil[0]+t[2]*wil[1]+n[2]*wil[2])
        return acc + f + sdot(wiw, wo_) * u
    return jax.lax.fori_loop(0, ITERS, body, jnp.zeros(N))

timed("SoA pre-split args", soa_chain2, wox, woy, woz, nsx, nsy, nsz, ngx, ngy, ngz, tgx, tgy, tgz, wix, wiy, wiz, u)
