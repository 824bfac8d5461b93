"""Multi-host smoke test (SURVEY.md section 4 item 4): two localhost
processes form a jax.distributed group (P6, SURVEY.md 2.3), build a global
mesh over 2x4 fake CPU devices, and run the collective EM fixed point with
cross-process psums; the result must match the single-process CSR EM.

  python benchmarks/multihost_smoke.py          # launcher
  python benchmarks/multihost_smoke.py --worker # (internal)
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PORT = 43217
NPROC = 2
LOCAL_DEVICES = 4


def worker(process_id: int) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", LOCAL_DEVICES)
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{PORT}",
        num_processes=NPROC,
        process_id=process_id,
    )
    import numpy as np

    from seekmer_tpu.config import EMConfig, ShardConfig
    from seekmer_tpu.em.em import build_ec_table, run_em
    from seekmer_tpu.parallel.collective_em import run_em_collective
    from seekmer_tpu.parallel.mesh import make_mesh

    assert jax.device_count() == NPROC * LOCAL_DEVICES, jax.devices()

    rng = np.random.default_rng(0)  # identical system in every process
    T, E = 40, 100
    lengths = rng.integers(300, 2000, size=T).astype(np.int32)
    members = [np.sort(rng.choice(T, size=int(rng.integers(1, 5)),
                                  replace=False)).astype(np.int32)
               for _ in range(E)]
    counts = rng.integers(1, 200, size=E).astype(np.float64)
    ec = build_ec_table(members, counts, T)
    cfg = EMConfig(rel_tol=1e-6)

    shard_cfg = ShardConfig(data_axis=NPROC * LOCAL_DEVICES)
    mesh = make_mesh(shard_cfg)
    alpha, it = run_em_collective(ec, lengths, cfg, mesh, shard_cfg)

    ref, _ = run_em(ec, lengths, cfg)
    err = float(np.abs(np.asarray(alpha) - np.asarray(ref)).max())
    print(f"[proc {process_id}] devices={jax.device_count()} "
          f"iters={int(it)} max_abs_err_vs_local={err:.3g}", flush=True)
    assert err < 1e-2, err

    # CHUNKED collective EM across processes: the host-driven block loop
    # adapts its enqueue count k from local timing, which must be agreed
    # across hosts (process-0 broadcast, round-4 fix) or the collective
    # block programs deadlock; state must equal the while_loop form.
    alpha_c, it_c = run_em_collective(ec, lengths, cfg, mesh, shard_cfg,
                                      chunked=True)
    assert int(it_c) == int(it), (int(it_c), int(it))
    np.testing.assert_array_equal(np.asarray(alpha_c), np.asarray(alpha))
    print(f"[proc {process_id}] chunked collective EM state-identical "
          f"across processes", flush=True)

    # Sharded bootstrap, chunked + stage snapshots, across processes: the
    # snapshot hook allgathers the replicate-sharded alpha (collective —
    # every host joins, only process 0 records), and resuming from a
    # mid-run snapshot must replay to the identical result.
    from jax.experimental import multihost_utils as _mhu

    from seekmer_tpu.parallel.bootstrap_shard import run_bootstrap_sharded
    from seekmer_tpu.parallel.ckpt_mp import allgather_host

    em_b = EMConfig(rel_tol=1e-8, check_every=8, max_iters=200,
                    bootstrap_samples=8, bootstrap_seed=9)
    base = allgather_host(run_bootstrap_sharded(
        ec, lengths, em_b, mesh, shard_cfg, chunked=False))
    saves = []
    hook = (lambda a, i: saves.append((a, i))) if process_id == 0 else None
    chk = allgather_host(run_bootstrap_sharded(
        ec, lengths, em_b, mesh, shard_cfg, chunked=True,
        snapshots=True, on_sync=hook))
    np.testing.assert_array_equal(chk, base)
    n_saves = int(np.asarray(_mhu.broadcast_one_to_all(
        np.int64(len(saves)))))
    if n_saves:
        a0 = (saves[0][0] if process_id == 0
              else np.zeros((ec.num_transcripts, 8)))
        it0 = np.int64(saves[0][1] if process_id == 0 else 0)
        a0 = np.asarray(_mhu.broadcast_one_to_all(
            np.asarray(a0, np.float64)))
        it0 = int(np.asarray(_mhu.broadcast_one_to_all(it0)))
        res = allgather_host(run_bootstrap_sharded(
            ec, lengths, em_b, mesh, shard_cfg, alpha_init=a0,
            it_init=it0, chunked=True))
        np.testing.assert_array_equal(res, base)
    print(f"[proc {process_id}] sharded bootstrap chunked+snapshots "
          f"across processes (resumed from {n_saves} saves)", flush=True)

    # DP mapping across processes: each host feeds its shard of a global
    # batch (per-host FASTQ shards, BASELINE config 3); the merged result
    # must equal single-chip mapping of all reads.
    from seekmer_tpu.config import MapConfig
    from seekmer_tpu.index.build import build_index_from_seqs
    from seekmer_tpu.io.fastq import ReadBatch
    from seekmer_tpu.map.driver import Mapper
    from seekmer_tpu.map.signature import SIG_PAD
    from seekmer_tpu.parallel.data_parallel import DataParallelMapper
    from seekmer_tpu.utils.simulate import (
        random_transcriptome, simulate_packed_batches,
    )

    rng = np.random.default_rng(1)
    names, seqs = random_transcriptome(rng, num_transcripts=30,
                                      shared_prefix_frac=0.5)
    index = build_index_from_seqs(names, seqs)
    Bg, L = 256, 96
    codes, _ = simulate_packed_batches(rng, seqs, 2, Bg, read_len=L)

    cfg_map = MapConfig(batch_size=Bg, sig_table_bits=12)
    dp = DataParallelMapper(index, cfg_map, shard_cfg, mesh=mesh)
    B_local = Bg // NPROC
    lo, hi_ = process_id * B_local, (process_id + 1) * B_local
    for i in range(2):
        dp.feed(ReadBatch(codes[i][lo:hi_],
                          np.full(B_local, L, np.int32),
                          np.ones(B_local, np.int32)))
    res = dp.finalize()

    single = Mapper(index, cfg_map)
    for i in range(2):
        single.feed(ReadBatch(codes[i], np.full(Bg, L, np.int32),
                              np.ones(Bg, np.int32)))
    ref_res = single.finalize()

    def as_dict(r):
        return {tuple(row[row != int(SIG_PAD)].tolist()): int(n)
                for row, n in zip(r.sigs, r.sig_counts)}

    assert res.total_reads == ref_res.total_reads == 2 * Bg
    assert as_dict(res) == as_dict(ref_res)
    print(f"[proc {process_id}] DP mapping across processes: "
          f"{res.mapped}/{res.total_reads} mapped == single-chip", flush=True)

    # PREFIX-SHARDED paired mapping across processes (BASELINE config 4 is
    # multi-HOST): index sharded over a 4-wide `index` axis spanning both
    # processes, each process feeds its local half of every global batch,
    # queries cross the process boundary through lax.all_to_all, and the
    # allgathered merge must equal the single-chip result exactly.
    from seekmer_tpu.io.fastq import batch_read_pairs
    from seekmer_tpu.parallel.prefix_shard import PrefixShardedMapper
    from seekmer_tpu.utils.simulate import simulate_reads

    rng = np.random.default_rng(2)  # identical data in every process
    sim = simulate_reads(rng, seqs, num_reads=2 * Bg, read_len=L,
                         paired=True, mean_frag=180.0, sd_frag=15.0)
    pairs = zip([r.encode() for r in sim.reads1],
                [r.encode() for r in sim.reads2])
    cfg_px = MapConfig(batch_size=Bg, sig_table_bits=12, paired_end=True)
    shard_px = ShardConfig(data_axis=NPROC, index_axis=LOCAL_DEVICES,
                           index_mode="prefix")
    mesh_px = make_mesh(shard_px)
    batches = list(batch_read_pairs(pairs, cfg_px))
    px = PrefixShardedMapper(index, cfg_px, shard_px, mesh=mesh_px)
    assert px.supports_checkpoint()  # multi-process via per-host cursors
    B_local = Bg // NPROC
    lo, hi_ = process_id * B_local, (process_id + 1) * B_local
    for b in batches:
        px.feed(ReadBatch(b.codes[lo:hi_], b.lengths[lo:hi_],
                          b.weights[lo:hi_],
                          codes2=b.codes2[lo:hi_],
                          lengths2=b.lengths2[lo:hi_]))
    res_px = px.finalize()

    single_px = Mapper(index, cfg_px)
    for b in batches:
        single_px.feed(b)
    ref_px = single_px.finalize()
    assert res_px.total_reads == ref_px.total_reads == 2 * Bg
    assert as_dict(res_px) == as_dict(ref_px)
    print(f"[proc {process_id}] prefix-sharded PAIRED mapping across "
          f"processes: {res_px.mapped}/{res_px.total_reads} mapped == "
          f"single-chip (extra routing rounds: "
          f"{px.extra_routing_rounds})", flush=True)

    # MULTI-PROCESS checkpoint/resume (SURVEY.md 5.3 — no mode
    # carve-outs): each host streams its OWN FASTQ shard through a
    # cursor-bearing source; the run checkpoints mid-stream (collective
    # save: one allgathered global table + step-stamped per-host cursor
    # sidecars, parallel/ckpt_mp.py); a NEW mapper restores and finishes;
    # the merged result must equal the uninterrupted run's exactly.
    from seekmer_tpu.io.fastq import CheckpointableBatchSource

    workdir = os.environ["SEEKMER_SMOKE_DIR"]
    B_loc = Bg // NPROC
    # UNEQUAL per-host batch counts (host 0: 3, host 1: 4): DP feeds do
    # not synchronize processes, so real per-host FASTQ shards differ in
    # length — the checkpoint loop must survive one host exhausting its
    # shard while the other still feeds/saves (driver.py
    # _run_with_checkpoints_multiprocess).
    n_batches = 3 + process_id
    rng = np.random.default_rng(3 + process_id)  # DIFFERENT data per host
    simc = simulate_reads(rng, seqs, num_reads=n_batches * B_loc, read_len=L)
    fq = os.path.join(workdir, f"ckpt_reads_p{process_id}.fq")
    with open(fq, "w") as fh:
        for i, r in enumerate(simc.reads1):
            fh.write(f"@r{i}\n{r}\n+\n{'I' * len(r)}\n")
    ckpt = os.path.join(workdir, "mp.ckpt.npz")
    cfg_src = MapConfig(batch_size=B_loc, sig_table_bits=12)
    total_global = (3 + 4) * B_loc

    def make_src():
        src = CheckpointableBatchSource([fq], cfg=cfg_src)
        # decode chunk == one batch -> every batch carries a cursor
        src.CHUNK = B_loc
        return src

    full_mp = DataParallelMapper(index, cfg_map, shard_cfg, mesh=mesh).run(
        iter(make_src()))

    # a full checkpointed run over the unequal shards: host 0 exhausts a
    # round early and must keep joining the collective rounds/saves
    res_ck = DataParallelMapper(index, cfg_map, shard_cfg, mesh=mesh).run(
        iter(make_src()), checkpoint_path=ckpt, checkpoint_every=2)
    assert as_dict(res_ck) == as_dict(full_mp)

    m1 = DataParallelMapper(index, cfg_map, shard_cfg, mesh=mesh)
    fed = 0
    for b in iter(make_src()):
        m1.feed(b)
        fed += 1
        if fed == 2:  # fixed index: the collective save stays aligned
            assert b.cursor is not None
            m1.save_checkpoint(ckpt, stream_state=b.cursor)
            break

    m2 = DataParallelMapper(index, cfg_map, shard_cfg, mesh=mesh)
    src2 = make_src()
    state = m2.restore_checkpoint(ckpt)
    assert state, state  # this host's cursor came back
    src2.restore(state)
    res_mp = m2.run(iter(src2))
    assert res_mp.total_reads == full_mp.total_reads == total_global
    assert as_dict(res_mp) == as_dict(full_mp)
    print(f"[proc {process_id}] multi-process checkpoint/resume "
          f"(unequal shards {3}/{4} batches): "
          f"{res_mp.mapped}/{res_mp.total_reads} mapped == uninterrupted",
          flush=True)

    # DIVERGENT-host restore must abort EVERY host, not deadlock the
    # survivors: delete host 1's cursor sidecar (the crash-between-table-
    # and-sidecar signature restore_sharded_checkpoint detects). Host 1's
    # restore raises; the quantifier's collective agreement
    # (quantify_files) must turn that into an error on BOTH hosts instead
    # of host 0 proceeding into the next collective and hanging
    # (round-3 advisor/verdict finding).
    from jax.experimental import multihost_utils as mhu

    from seekmer_tpu.config import PipelineConfig
    from seekmer_tpu.models.quantifier import Quantifier
    from seekmer_tpu.utils.checkpoint import host_cursor_path

    if process_id == 1:
        os.remove(host_cursor_path(ckpt, 1))
    mhu.sync_global_devices("smoke_corrupt_sidecar")
    q2 = Quantifier(index, PipelineConfig(map=cfg_src, shard=shard_cfg))
    try:
        q2.quantify_files([fq], checkpoint_path=ckpt)
        raise AssertionError("divergent-host restore did not raise")
    except ValueError as e:
        emsg = str(e).splitlines()[0][:72]
    print(f"[proc {process_id}] divergent-host restore aborted on every "
          f"host: {emsg}", flush=True)

    # stage-snapshot broadcast (quantifier._broadcast_snapshot): only
    # process 0 reads snapshots from disk; every host must end up with
    # process 0's (alpha, it, converged) or EM backends/branches diverge

    q = Quantifier.__new__(Quantifier)  # method needs no pipeline state
    local = (np.arange(4.0), 5, True) if process_id == 0 else (None, 0,
                                                               False)
    a, it, conv = Quantifier._broadcast_snapshot(q, *local, (4,))
    assert np.array_equal(a, np.arange(4.0)) and (it, conv) == (5, True)
    a2, it2, conv2 = Quantifier._broadcast_snapshot(q, None, 0, False, (4,))
    assert a2 is None and (it2, conv2) == (0, False)
    print(f"[proc {process_id}] snapshot broadcast agrees", flush=True)
    jax.distributed.shutdown()


def launcher() -> int:
    import tempfile

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = REPO
    env["SEEKMER_SMOKE_DIR"] = tempfile.mkdtemp(prefix="seekmer_smoke_")
    procs = [
        subprocess.Popen(
            [sys.executable, __file__, "--worker", str(i)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(NPROC)
    ]
    ok = True
    for i, p in enumerate(procs):
        out, _ = p.communicate(timeout=300)
        print(out)
        ok &= p.returncode == 0
    print("multihost smoke:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", type=int, default=None)
    a = ap.parse_args()
    if a.worker is None:
        sys.exit(launcher())
    worker(a.worker)
