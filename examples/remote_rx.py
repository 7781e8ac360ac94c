#!/usr/bin/env python
"""remote_rx — receive I/Q samples over the network and record or relay
them (the `lib/examples/zmq_remote_rx.c` analog on the UDP sample link).

  python examples/remote_rx.py --listen 5010 -o capture.cf32 -n 192000
  python examples/remote_rx.py --listen 5010 --forward 127.0.0.1:5020

Pair with the native GIL-free pump (`srsran_tpu.native.SampleRing`) or
any cf32-datagram source (e.g. examples/pdsch_enodeb.py | NetSink).
"""

from __future__ import annotations

import argparse

import numpy as np


def main(argv=None):
    from srsran_tpu.io import FileSink, NetSink, NetSource

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--listen", type=int, required=True, help="UDP port")
    ap.add_argument("-o", "--output", help="cf32 output file")
    ap.add_argument("--forward", help="host:port to relay datagrams to")
    ap.add_argument("-n", "--nof-samples", type=int, default=192000)
    args = ap.parse_args(argv)

    src = NetSource("127.0.0.1", args.listen)
    print(f"listening on udp:{args.listen}", flush=True)
    sink = FileSink(args.output) if args.output else None
    fwd = None
    if args.forward:
        host, port = args.forward.rsplit(":", 1)
        fwd = NetSink(host, int(port))

    import socket as _socket

    got = 0
    while got < args.nof_samples:
        try:
            chunk = src.read(min(8192, args.nof_samples - got))
        except (_socket.timeout, TimeoutError):
            print(f"timeout after {got} samples")
            break
        if chunk is None or len(chunk) == 0:
            continue
        if sink is not None:
            sink.write(chunk)
        if fwd is not None:
            fwd.write(np.asarray(chunk))
        got += len(chunk)
    if sink is not None:
        sink.close()
    print(f"received {got} samples")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
