"""The tutorial kernels must stay correct (the analog of test_all_examples,
`cuda_examples.cuh:638-657`)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "examples"))


def test_tutorial_kernels_verify():
    import pallas_tutorial

    pallas_tutorial.main()
