"""Transport-layer tests: LocalBus semantics + real-socket TcpBus."""
import threading
import time

import numpy as np
import pytest

from scl_slam_tpu.runtime.transport import (
    DescriptorMsg,
    LocalBus,
    TcpBus,
    VerifyRequest,
    VerifyResponse,
)


def make_msg(robot=0, index=0):
    return DescriptorMsg(
        robot=robot,
        index=index,
        pre_pose=np.eye(4),
        cur_pose=np.eye(4),
        values=np.arange(12, dtype=np.float32),
        stamp=1.5,
    )


class TestLocalBus:
    def test_broadcast_skips_sender(self):
        bus = LocalBus()
        got = {0: [], 1: [], 2: []}
        for r in range(3):
            bus.register(r, lambda m, r=r: got[r].append(m), lambda req: None)
        bus.broadcast_descriptor(0, make_msg())
        assert len(got[0]) == 0 and len(got[1]) == 1 and len(got[2]) == 1

    def test_verify_routes_to_target(self):
        bus = LocalBus()
        bus.register(0, lambda m: None, lambda req: VerifyResponse(False, None, 0.0))
        bus.register(
            1, lambda m: None, lambda req: VerifyResponse(True, np.eye(4), 0.9)
        )
        resp = bus.verify(
            1, VerifyRequest(0, 5, 1, 3, np.zeros((4, 3)), np.ones(4), np.eye(4))
        )
        assert resp.success and resp.inlier_ratio == 0.9


class TestTcpBus:
    def test_roundtrip_over_sockets(self):
        ports = {0: 47311, 1: 47312}
        peers = {r: ("127.0.0.1", p) for r, p in ports.items()}
        bus0 = TcpBus(0, ports[0], peers)
        bus1 = TcpBus(1, ports[1], peers)
        got1 = []
        bus0.register(0, lambda m: None, lambda req: VerifyResponse(False, None, 0.0))
        bus1.register(
            1,
            lambda m: got1.append(m),
            lambda req: VerifyResponse(True, np.eye(4) * 2, req.index_cur / 10),
        )
        try:
            bus0.broadcast_descriptor(0, make_msg(robot=0, index=7))
            deadline = time.time() + 5
            while not got1 and time.time() < deadline:
                time.sleep(0.01)
            assert got1 and got1[0].index == 7
            np.testing.assert_array_equal(
                got1[0].values, np.arange(12, dtype=np.float32)
            )

            resp = bus0.verify(
                1, VerifyRequest(0, 5, 1, 3, np.zeros((8, 3), np.float32), np.ones(8, bool), np.eye(4))
            )
            assert resp.success and abs(resp.inlier_ratio - 0.5) < 1e-9
        finally:
            bus0.close()
            bus1.close()
