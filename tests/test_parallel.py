"""Mesh sharding: 8-virtual-device shard_map ≡ single-device results."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from svtyper_tpu.evidence.device import classify
from svtyper_tpu.ops.gl import genotype_batch, log_choose_table
from svtyper_tpu.parallel import (
    make_mesh,
    make_sharded_step,
    merge_ordered,
    shard_slices,
    stack_shards,
)
from svtyper_tpu.parallel.synth import make_synthetic_chunk


def test_shard_slices():
    assert shard_slices(10, 4) == [(0, 3), (3, 6), (6, 8), (8, 10)]
    assert shard_slices(8, 8) == [(i, i + 1) for i in range(8)]
    assert shard_slices(3, 8)[-1] == (3, 3)


def test_merge_ordered():
    sl = shard_slices(10, 3)
    rows = [np.arange(lo, hi) for lo, hi in sl]
    merged = merge_ordered(rows, sl)
    assert merged.tolist() == list(range(10))
    with pytest.raises(AssertionError):
        merge_ordered([rows[1], rows[0], rows[2]], sl)


def test_sharded_step_matches_local():
    n_dev = 8
    mesh = make_mesh(n_dev)
    n_var = 8
    shards, dens = [], None
    for i in range(n_dev):
        chunk, dens = make_synthetic_chunk(n_var=n_var, frags_per_var=2 + i % 3)
        shards.append(chunk)
    stacked = stack_shards(shards)
    dtype = jnp.float64
    step = make_sharded_step(mesh, n_var, dtype=dtype)
    lcf = jnp.asarray(log_choose_table(1 << 12, use_f64=True))
    dens_stack = jnp.asarray(np.stack([dens] * n_dev), dtype=dtype)
    out = jax.device_get(
        step(stacked["reads"], stacked["pairs"], stacked["variants"],
             dens_stack, lcf)
    )
    assert out["gt_idx"].shape == (n_dev, n_var)

    # per-shard local recomputation must agree exactly
    for d, chunk in enumerate(shards):
        counts = classify(
            {k: jnp.asarray(v) for k, v in chunk.reads.items()},
            {k: jnp.asarray(v) for k, v in chunk.pairs.items()},
            {k: jnp.asarray(v) for k, v in chunk.variants.items()},
            jnp.asarray(dens, dtype=dtype),
            n_var, 20, dtype=dtype,
        )
        local = jax.device_get(
            genotype_batch(
                counts,
                jnp.asarray(chunk.variants["is_dup"]),
                jnp.asarray(chunk.variants["force_null"]),
                lcf,
            )
        )
        np.testing.assert_array_equal(out["gt_idx"][d], local["gt_idx"])
        # different XLA programs may fuse/reassociate differently; the
        # formatted-output surface (%.0f GLs) is what parity guards
        np.testing.assert_allclose(out["gl"][d], local["gl"], rtol=1e-12)


def test_graft_entry_single_and_multi():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.device_get(jax.jit(fn)(*args))
    assert out["gt_idx"].shape[0] == 64
    assert not out["null"].any()
    g.dryrun_multichip(8)
    g.dryrun_multichip(4)


def test_engine_multidevice_byte_identical(tmp_path):
    """TpuEngine on the 8-device mesh ≡ single-device engine, end to end
    through the CLI formatting layer (VERDICT task: multi-chip in the
    production engine, not a demo step)."""
    import io

    from svtyper_tpu.bamio.bam import BamFile
    from svtyper_tpu.breakpoints import resolve_breakpoint
    from svtyper_tpu.gt import TpuEngine
    from svtyper_tpu.output import add_format_headers, apply_variant
    from svtyper_tpu.simulate import (
        Event, SimConfig, events_to_vcf, simulate_events,
    )
    from svtyper_tpu.stats import Sample
    from svtyper_tpu.vcfio.model import Variant, Vcf
    from svtyper_tpu.vcfio.reader import read_vcf_lines

    refs = [("chr1", 4_000_000)]
    events = [
        Event("DEL", "chr1", 300_000 + i * 250_000,
              300_000 + i * 250_000 + 1500 + 97 * i,
              ["0/0", "0/1", "1/1"][i % 3], var_id="v%d" % i)
        for i in range(13)  # not a multiple of 8: exercises padding
    ]
    bam_path = str(tmp_path / "md.bam")
    simulate_events(bam_path, refs, events, SimConfig(depth=30), seed=9,
                    extra_background=1000)
    sample = Sample.from_bam(BamFile(bam_path), num_samp=50_000)
    vcf = Vcf()
    header, body = read_vcf_lines(io.StringIO(events_to_vcf(events, refs)))
    vcf.add_header(header)
    add_format_headers(vcf)
    vcf.add_sample(sample.name)
    variants = [Variant(line, vcf) for line in body]
    bps = [resolve_breakpoint(v) for v in variants]

    assert len(jax.devices()) == 8  # conftest virtual mesh
    multi = TpuEngine([sample], chunk_size=8)   # 13 vars → 2 chunks
    single = TpuEngine([sample], chunk_size=8,
                       devices=jax.devices()[:1])
    assert multi.n_dev == 8 and single.n_dev == 1
    rows_m = multi.genotype_all(bps)
    rows_s = single.genotype_all(bps)

    def render(rows):
        out = []
        for v, row in zip(variants, rows):
            apply_variant(v, [sample.name], row)
            out.append(v.get_var_string())
        return "\n".join(out)

    assert render(rows_m) == render(rows_s)
    called = sum(1 for r in rows_m if not r[0].null)
    assert called == len(bps)


def test_shard_map_translates_check_vma_for_legacy_jax(monkeypatch):
    """parallel.mesh.shard_map must rewrite check_vma -> check_rep when
    the underlying jax shard_map predates the new kwarg."""
    from svtyper_tpu.parallel import mesh as M

    seen = {}

    def legacy(f, mesh=None, in_specs=None, out_specs=None, check_rep=True):
        seen["check_rep"] = check_rep
        return f

    monkeypatch.setattr(M, "_shard_map", legacy)
    out = M.shard_map(lambda x: x, mesh=None, in_specs=None,
                      out_specs=None, check_vma=False)
    assert seen == {"check_rep": False}
    assert out(7) == 7

    def modern(f, mesh=None, in_specs=None, out_specs=None, check_vma=True):
        seen["check_vma"] = check_vma
        return f

    monkeypatch.setattr(M, "_shard_map", modern)
    M.shard_map(lambda x: x, mesh=None, in_specs=None,
                out_specs=None, check_vma=False)
    assert seen["check_vma"] is False
