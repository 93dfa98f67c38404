"""Build the native IO runtime: `python native/setup.py build_ext --inplace`
(or `make -C native`). Produces itermvs_io*.so importable from the repo
root; itermvs_tpu/io picks it up automatically when present."""
import os

from setuptools import Extension, setup

HERE = os.path.dirname(os.path.abspath(__file__))

setup(
    name="itermvs_io",
    version="0.1.0",
    ext_modules=[
        Extension(
            "itermvs_io",
            sources=[os.path.join(HERE, "itermvs_io/itermvs_io.cc")],
            extra_compile_args=["-O3", "-std=c++17", "-Wall"],
        )
    ],
)
