"""Unit coverage for the profiling tool behind the megakernel memo
(`tools/profile_step.py`). The op histogram itself needs a real TPU device
plane (CPU traces carry only host planes), so these pin the host-side
pieces: category rules, trace reading, the loud no-device-plane failure,
and that the traced step program builds and runs."""
import pytest


def test_categorize_uses_prefix_only():
    from iggcn_tpu.tools.profile_step import categorize

    # fusion calling %fused_reduce must NOT be categorized as reduce
    assert categorize(
        "%loop_fusion.3 = f32[8]{0} fusion(...), calls=%fused_reduce"
    ) == "fused elementwise/loop"
    assert categorize("%reduce.7 = f32[] reduce(...)") == "reduce"
    assert categorize("%dot.1 = f32[8,8]{1,0} dot(...)") == "matmul/conv (MXU)"
    assert categorize("%copy-start.2 = ... copy-start(...)"
                      ) == "async DMA (overlapped)"
    assert categorize("%slice-start.12 = ((f32[256,90,90])...)"
                      ) == "async DMA (overlapped)"
    assert categorize("%transpose.9 = ...") == "copy/layout/transpose"
    assert categorize("%copy.7 = f32[3] copy(%fusion.1)"
                      ) == "copy/layout/transpose"
    assert categorize("%rng-bit-generator") == "rng"
    assert categorize("%custom-call.1 = ...") == "other"


def test_read_xspace_missing_dir(tmp_path):
    from iggcn_tpu.tools.profile_step import _read_xspace

    with pytest.raises(FileNotFoundError):
        _read_xspace(str(tmp_path))


def test_cpu_trace_fails_loudly_and_step_builds(tmp_path):
    """A CPU trace has no 'XLA Ops' device plane: collect_histogram must
    raise (listing what it saw) rather than return an empty histogram the
    memo numbers would silently trust. Also exercises build_step end-to-end
    (the traced program is the real fused train step)."""
    import jax

    from iggcn_tpu.tools.profile_step import build_step, collect_histogram

    step, state, batch = build_step(4)
    rng = jax.random.PRNGKey(0)
    state, loss = step(state, batch, rng)
    assert float(loss) == float(loss)  # finite, not NaN

    out = str(tmp_path / "trace")
    jax.profiler.start_trace(out)
    state, loss = step(state, batch, rng)
    _ = float(loss)
    jax.profiler.stop_trace()
    with pytest.raises(RuntimeError, match="no 'XLA Ops' line"):
        collect_histogram(out)
