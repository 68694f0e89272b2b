"""Top-level API surface and profiling utilities."""

import time


def test_lazy_api_surface():
    import fashionvisualexpl_tpu as fvx

    assert fvx.BPRMF.__name__ == "BPRMF"
    assert fvx.TrainConfig().batch_size == 256
    assert callable(fvx.fit)
    try:
        fvx.not_a_thing
        assert False
    except AttributeError:
        pass


def test_step_timer():
    from fashionvisualexpl_tpu.utils.profiling import StepTimer

    t = StepTimer()
    time.sleep(0.01)
    t.lap("a")
    time.sleep(0.02)
    t.lap("b")
    t.lap("a")
    s = t.summary()
    assert s["a"]["count"] == 2
    assert s["b"]["total_s"] >= 0.015
