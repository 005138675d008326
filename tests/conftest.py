import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDENS = os.path.join(REPO, "tests", "goldens")
sys.path.insert(0, REPO)


@pytest.fixture(scope="session")
def goldens_dir():
    return GOLDENS


def load_golden(name):
    with open(os.path.join(GOLDENS, name)) as f:
        return json.load(f)


@pytest.fixture(scope="session")
def arial_sheet():
    from ocr_spark.png import decode_gray

    with open(os.path.join(GOLDENS, "arial.gray.png"), "rb") as f:
        return decode_gray(f.read())


@pytest.fixture(scope="session")
def arial_alphabet(arial_sheet):
    from ocr_spark.kernel.classify import Alphabet

    return Alphabet().learn_sheet(arial_sheet, "arial")
