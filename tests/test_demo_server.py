"""gd3d-demo: the upload -> reconstruct -> inspect browser loop.

Reference equivalent: dust3r/demo.py + mast3r/demo.py (gradio apps). The
test drives the real HTTP surface end to end: renders synthetic views,
POSTs them as multipart uploads, follows the redirect, and checks the
scene.html viewer + scene.npz artifacts the browser would load.
"""
import http.client
import uuid

import numpy as np

from gd3d.cli.demo import _parse_multipart, parse_args, serve_background


def _multipart(files, fields):
    boundary = f"----gd3d{uuid.uuid4().hex}"
    out = bytearray()
    for name, value in fields.items():
        out += (f"--{boundary}\r\nContent-Disposition: form-data; "
                f'name="{name}"\r\n\r\n{value}\r\n').encode()
    for fname, payload in files:
        out += (f"--{boundary}\r\nContent-Disposition: form-data; "
                f'name="images"; filename="{fname}"\r\n'
                f"Content-Type: image/png\r\n\r\n").encode()
        out += payload + b"\r\n"
    out += f"--{boundary}--\r\n".encode()
    return bytes(out), f"multipart/form-data; boundary={boundary}"


def test_parse_multipart_roundtrip():
    body, ctype = _multipart(
        [("a.png", b"\x89PNG123"), ("b.png", b"x" * 10)],
        {"niter": "7", "pairs": "sliding"})
    fields, files = _parse_multipart(body, ctype)
    assert fields == {"niter": "7", "pairs": "sliding"}
    assert files == [("a.png", b"\x89PNG123"), ("b.png", b"x" * 10)]


def test_demo_server_reconstructs_uploads(tmp_path):
    from gd3d.data.render_synthetic import render_object_tree

    render_object_tree(str(tmp_path / "views"), ["obj"], n_views=3, size=96)
    imgs = sorted((tmp_path / "views" / "obj").glob("color_*.png"))

    args = parse_args(["--output", str(tmp_path / "scenes"), "--tiny",
                       "--port", "0", "--size", "224", "--niter", "3",
                       "--min-conf", "0.0"])
    srv, port = serve_background(args)
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
        conn.request("GET", "/")
        r = conn.getresponse()
        assert r.status == 200 and b"reconstruct" in r.read()

        body, ctype = _multipart(
            [(p.name, p.read_bytes()) for p in imgs],
            {"niter": "3", "pairs": "sliding"})
        conn.request("POST", "/reconstruct", body=body,
                     headers={"Content-Type": ctype})
        r = conn.getresponse()
        r.read()
        assert r.status == 303, r.status
        loc = r.getheader("Location")
        assert loc.endswith("/scene.html")

        conn.request("GET", loc)
        r = conn.getresponse()
        page = r.read()
        assert r.status == 200 and b"<html" in page.lower()

        session = loc.split("/")[2]
        z = np.load(tmp_path / "scenes" / session / "scene.npz")
        assert z["poses"].shape == (len(imgs), 4, 4)
        assert np.all(np.isfinite(z["poses"]))

        # the index now lists the scene; traversal outside the root 404s
        conn.request("GET", "/")
        assert session.encode() in conn.getresponse().read()
        conn.request("GET", "/scenes/../../etc/passwd")
        r = conn.getresponse()
        r.read()
        assert r.status == 404
    finally:
        srv.shutdown()
        srv.server_close()
