"""Provide ``xplane_pb2``, generating it from tools/xplane.proto if needed.

The proto is a minimal transcription of the public tsl profiler XSpace
schema (the format ``jax.profiler.trace`` writes); protoc is available in
the image, so the generated module is built on first import rather than
checked in.
"""
import os
import subprocess
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))

if not os.path.exists(os.path.join(_HERE, 'xplane_pb2.py')):
    subprocess.run(['protoc', '--python_out=.', 'xplane.proto'],
                   cwd=_HERE, check=True)

sys.path.insert(0, _HERE)
import xplane_pb2  # noqa: E402,F401
