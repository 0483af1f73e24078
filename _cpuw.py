import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_platforms", "cpu")
from tfhe_aes_tpu.params import PARAM_TPU as P
from tfhe_aes_tpu.utils import serialization
from tfhe_aes_tpu.client.client import Client
from tfhe_aes_tpu.models import fhe_aes
from tfhe_aes_tpu.ops import wopbs
sk, dk = serialization.load_keys(serialization.cache_path(P, 0))
client = Client(P, seed=0); client.sk = sk
ct = jnp.asarray(np.stack([client.encrypt_byte(b) for b in range(16)]))
lut = jnp.asarray(fhe_aes._refresh_sbox_lut(P))
t0=time.time(); out = wopbs.many_wopbs(dk, ct, lut); out.block_until_ready(); print("first (compile+run)", time.time()-t0, flush=True)
t0=time.time(); out = wopbs.many_wopbs(dk, ct, lut); out.block_until_ready(); print("warm 16-byte WoPBS", time.time()-t0, flush=True)
b = client.decrypt_byte(np.asarray(out[3, 8:]))
import tfhe_aes_tpu.models.tables as T
assert b == int(T.sbox()[3]), b
print("sbox check ok", flush=True)
