"""Sample user flow: genotype simulated SNV clusters through the public API,
on the real TPU (JAX_PLATFORMS=axon default)."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from bayestyper_tpu.model.buckets import (
    build_bucket, cover_tiebreak_key, greedy_minimum_cover,
)
from bayestyper_tpu.model.gibbs import GibbsConfig, genotype_bucket, make_outcome_space
from bayestyper_tpu.model.stats import FilterConfig, collect_bucket_stats
from bayestyper_tpu.model.count_model import CountModel, NegativeBinomialParams
from bayestyper_tpu.ops.distributions import np_build_count_log_prob_tables

print("platform:", jax.devices())

rng = np.random.default_rng(42)
MEAN, VAR, NOISE = 15.0, 30.0, 0.05

def nb(mult, n):
    if mult == 0:
        return rng.poisson(NOISE, n)
    m, v = MEAN*mult, VAR*mult
    return rng.negative_binomial(m*m/(v-m), m/v, n)

def snv_cluster(gts, cid):
    s, nk = len(gts), 20
    mult = np.zeros((2*nk, 2), np.uint8); mult[:nk,0]=1; mult[nk:,1]=1
    counts = np.zeros((2*nk, s), np.uint8)
    for si,(a1,a2) in enumerate(gts):
        counts[:nk,si]=np.clip(nb((a1==0)+(a2==0),nk),0,255)
        counts[nk:,si]=np.clip(nb((a1==1)+(a2==1),nk),0,255)
    member = np.zeros((2*nk,1,2),bool); member[:,0,:]=mult>0
    return dict(mult=mult, inter_mult=np.zeros((2*nk,s),np.uint8), counts=counts,
                ploidy=np.full(s,2,np.int8), hap_allele=np.array([[0],[1]],np.int16),
                num_alleles=np.array([2],np.int16), member=member,
                cover=greedy_minimum_cover(
                    mult, (counts>0).any(1), cover_tiebreak_key(42, cid)
                ), cluster_id=cid)

truth = [[(0,0),(0,1),(1,1)], [(0,1),(1,1),(0,0)], [(1,1),(0,0),(0,1)], [(0,0),(0,0),(0,1)]]
clusters = [snv_cluster(g,i) for i,g in enumerate(truth)]
bucket = build_bucket(clusters, size_class=(4,64,4,2), num_samples=3).device_arrays()
tables = jnp.asarray(np_build_count_log_prob_tables(
    np.full(3, MEAN/VAR), np.full(3, MEAN*MEAN/(VAR-MEAN)), np.full(3,NOISE), 16))
outcomes = make_outcome_space(4)
cfg = GibbsConfig(num_chains=8, burn_in=50, num_samples=150, max_total_mult=8)

t0=time.time()
tally, w = genotype_bucket(jax.random.PRNGKey(1), bucket, tables, outcomes, cfg)
tally.block_until_ready(); t_compile=time.time()-t0
t0=time.time()
tally, w = genotype_bucket(jax.random.PRNGKey(2), bucket, tables, outcomes, cfg)
tally.block_until_ready(); t_run=time.time()-t0

filters = FilterConfig(0.99, 1.0, (0.9,0.9,0.9))
stats = collect_bucket_stats(bucket, outcomes, tally, w, filters, allele_capacity=4)
gt = np.asarray(stats.gt); gq = np.asarray(stats.gq)
print(f"compile {t_compile:.1f}s  run {t_run*1000:.0f}ms")
ok = 0
for c, gts in enumerate(truth):
    for s,(a1,a2) in enumerate(gts):
        called = tuple(gt[c,s,0]); exp = tuple(sorted((a1,a2)))
        match = called == exp; ok += match
        print(f"cluster{c} sample{s}: called {called} GQ={gq[c,s,0]:.0f} expected {exp} {'OK' if match else 'MISMATCH'}")
print(f"{ok}/12 correct")
