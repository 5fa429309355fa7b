"""Leader/follower schedule broadcast over loopback TCP."""
import threading

from tensorrt_llm_tpu.executor_orchestration import (RequestBroadcaster,
                                                     SerializableBatch)
from tensorrt_llm_tpu.runtime.request import LlmRequest
from tensorrt_llm_tpu.runtime.scheduler import ScheduledRequests
from tensorrt_llm_tpu.sampling_params import SamplingParams


def test_broadcast_roundtrip():
    req = LlmRequest(prompt_token_ids=[1, 2, 3],
                     sampling_params=SamplingParams(max_tokens=7, top_k=1),
                     cache_salt="s")
    req.context_chunk_size = 3
    batch = ScheduledRequests(context_requests=[req])
    sb = SerializableBatch.from_schedule(5, batch, [req])

    import random
    leader = RequestBroadcaster(rank=0)
    follower = RequestBroadcaster(rank=1)
    port = random.randint(30000, 50000)
    t = threading.Thread(target=leader.serve, args=(port, 1))
    t.start()
    follower.connect("127.0.0.1", port)
    t.join()
    leader.broadcast(sb)
    got = follower.recv()
    assert got.iter_id == 5
    assert got.scheduled_ctx_ids == [req.request_id]
    assert got.context_chunks[req.request_id] == 3
    news = got.materialize_new_requests()
    assert news[0].prompt_token_ids == [1, 2, 3]
    assert news[0].sampling_params.max_tokens == 7
    assert news[0].cache_salt == "s"
    leader.close()
    follower.close()


def test_broadcast_multiple_iterations():
    import random
    leader = RequestBroadcaster(rank=0)
    follower = RequestBroadcaster(rank=1)
    port = random.randint(30000, 50000)
    t = threading.Thread(target=leader.serve, args=(port, 1))
    t.start()
    follower.connect("127.0.0.1", port)
    t.join()
    for it in range(5):
        sb = SerializableBatch(iter_id=it, new_requests=[],
                               context_chunks={}, scheduled_ctx_ids=[],
                               scheduled_gen_ids=[it], draft_tokens={})
        leader.broadcast(sb)
    for it in range(5):
        got = follower.recv()
        assert got.iter_id == it and got.scheduled_gen_ids == [it]
    leader.close()
    follower.close()
