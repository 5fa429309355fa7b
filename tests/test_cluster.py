"""Disagg cluster membership: TTL leases, watch events, router binding,
scaling hints (reference: serve/disagg_auto_scaling.py
DisaggClusterManager + resource governor)."""
import asyncio

from tensorrt_llm_tpu.serve.cluster import DisaggClusterManager
from tensorrt_llm_tpu.serve.router import RoundRobinRouter


class FakeClock:
    def __init__(self):
        self.t = 0.0

    def __call__(self):
        return self.t


def test_ttl_eviction_and_watch():
    clk = FakeClock()
    mgr = DisaggClusterManager(ttl=10.0, clock=clk)
    events = []
    mgr.watch(lambda ev, w: events.append((ev, w.worker_id)))
    wid1 = mgr.register("context", "http://c1:8001")
    wid2 = mgr.register("generation", "http://g1:8002")
    assert events == [("join", wid1), ("join", wid2)]
    clk.t = 8.0
    assert mgr.heartbeat(wid1)
    clk.t = 12.0                 # wid2's lease (last hb at 0) expired
    dead = mgr.sweep()
    assert [w.worker_id for w in dead] == [wid2]
    assert ("leave", wid2) in events
    assert [w.worker_id for w in mgr.workers()] == [wid1]
    # expired worker must re-register
    assert not mgr.heartbeat(wid2)


def test_watch_replays_current_membership():
    mgr = DisaggClusterManager(ttl=5.0)
    wid = mgr.register("context", "http://c1:8001")
    seen = []
    mgr.watch(lambda ev, w: seen.append((ev, w.url)))
    assert seen == [("join", "http://c1:8001")]
    mgr.deregister(wid)
    assert seen[-1] == ("leave", "http://c1:8001")


def test_router_binding_join_leave():
    async def run():
        clk = FakeClock()
        mgr = DisaggClusterManager(ttl=10.0, clock=clk)
        ctx_r = RoundRobinRouter([])
        gen_r = RoundRobinRouter([])
        loop = asyncio.get_running_loop()
        mgr.bind_routers(ctx_r, gen_r, loop=loop)
        wid_c = mgr.register("context", "http://c1:8001")
        mgr.register("generation", "http://g1:8002")
        await asyncio.sleep(0.05)
        assert ctx_r.servers == ["http://c1:8001"]
        assert gen_r.servers == ["http://g1:8002"]
        # node leave via TTL expiry
        clk.t = 11.0
        mgr.heartbeat(wid_c)  # keep ctx alive; gen expires
        mgr.sweep()
        await asyncio.sleep(0.05)
        assert ctx_r.servers == ["http://c1:8001"]
        assert gen_r.servers == []
    asyncio.run(run())


def test_scaling_hints():
    mgr = DisaggClusterManager(ttl=5.0)
    assert mgr.scaling_hint("generation", {}) == "scale_up"  # no workers
    mgr.register("generation", "http://g1")
    mgr.register("generation", "http://g2")
    hot = {"http://g1": 9, "http://g2": 10}
    assert mgr.scaling_hint("generation", hot) == "scale_up"
    cold = {"http://g1": 0, "http://g2": 1}
    assert mgr.scaling_hint("generation", cold) == "scale_down"
    mixed = {"http://g1": 5, "http://g2": 0}
    assert mgr.scaling_hint("generation", mixed) == "steady"
