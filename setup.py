"""Install shim (reference: /root/reference/setup.py, which builds two CUDA
extensions at install time).

Here there is no install-time native compile step to get wrong: the only
native component, the C++ mesh sampler (``multi_part_assembly_tpu/native/``),
ships as source in the wheel/sdist and is compiled with ``make`` on first
import (``datasets/mesh_io.py``), falling back to a pure-numpy sampler when
no toolchain is present.  Run ``python setup.py build_native`` (or
``make -C multi_part_assembly_tpu/native``) to pre-build it.
"""

import subprocess

from setuptools import Command, setup


class BuildNative(Command):
    """Pre-build the C++ mesh sampler shared library in-place."""

    description = 'compile multi_part_assembly_tpu/native/libmpa_mesh.so'
    user_options = []

    def initialize_options(self):
        pass

    def finalize_options(self):
        pass

    def run(self):
        subprocess.run(['make', '-C', 'multi_part_assembly_tpu/native'],
                       check=True)


setup(cmdclass={'build_native': BuildNative})
