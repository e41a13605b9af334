"""Loop-nest IR hoisting (perfmodel/loopnest.py) on hand-computed cases."""

from ant_quantization_tpu.perfmodel.loopnest import Loop, LoopNest


def _matmul_nest():
    # for oc (4): for ic (8): { read wgt tile, read act tile, write out }
    return LoopNest([
        Loop("oc", 4, {"wgt": 1, "act": 0, "out": 1}),
        Loop("ic", 8, {"wgt": 1, "act": 1, "out": 0}),
    ])


def test_no_promotion_counts_every_trip():
    nest = _matmul_nest()
    nest.add_read("wgt", 100)
    nest.add_read("act", 50)
    nest.add_write("out", 10)
    t = nest.traffic()
    assert t["wgt"] == 100 * 32      # issued inside both loops
    assert t["act"] == 50 * 32
    assert t["out"] == 10 * 32


def test_stride_zero_hoist_is_free():
    """out does not advance with ic (stride 0) so it hoists out of ic for
    free; act strides with the innermost loop so it stays put."""
    nest = _matmul_nest()
    nest.add_write("out", 10)
    nest.add_read("act", 50)
    nest.promote({"wgt": 0, "act": 0, "out": 0})   # no SRAM: only stride-0
    t = nest.traffic()
    assert t["out"] == 10 * 4        # hoisted out of ic (stride 0)
    assert t["act"] == 50 * 32       # blocked at ic (stride 1, no SRAM)


def test_stride_zero_chain():
    nest = LoopNest([
        Loop("b", 3, {"wgt": 0}),
        Loop("oc", 4, {"wgt": 1}),
        Loop("ow", 5, {"wgt": 0}),
    ])
    nest.add_read("wgt", 7)
    nest.promote({"wgt": 0})
    # hoists through ow (stride 0), blocked by oc (strides, no sram)
    t = nest.traffic()
    assert t["wgt"] == 7 * 3 * 4


def test_sram_capacity_gates_promotion():
    nest = LoopNest([
        Loop("oc", 4, {"wgt": 1}),
        Loop("ic", 8, {"wgt": 1}),
    ])
    nest.add_read("wgt", 100)
    # 100*8 = 800 fits in 1000 -> buffer whole ic worth of tiles; the
    # grown 800*4 = 3200 does not fit -> blocked at oc
    nest.promote({"wgt": 1000})
    t = nest.traffic()
    assert t["wgt"] == 800 * 4
    op = nest.ops[0]
    assert op.promoted_level == 1 and op.promoted_size == 800


def test_full_promotion_reads_once():
    nest = LoopNest([
        Loop("oc", 4, {"wgt": 1}),
        Loop("ic", 8, {"wgt": 1}),
    ])
    nest.add_read("wgt", 100)
    nest.promote({"wgt": 10_000})    # everything fits: load once
    assert nest.traffic()["wgt"] == 3200
    assert nest.ops[0].promoted_level == 0


def test_describe_renders():
    nest = _matmul_nest()
    nest.add_read("wgt", 4)
    nest.promote({"wgt": 0})
    s = nest.describe()
    assert "for oc" in s and "read wgt" in s
