from thunderbolt_tpu.models.cells.base import CellModel
from thunderbolt_tpu.models.cells.fhn import FHNModel, AlievPanfilovModel
from thunderbolt_tpu.models.cells.pcg2019 import PCG2019Model
from thunderbolt_tpu.models.cells.tentusscher import (
    TenTusscherPanfilov2006Model,
    TenTusscherPanfilov2006EpiModel,
    TenTusscherPanfilov2006EndoModel,
    TenTusscherPanfilov2006MModel,
)
from thunderbolt_tpu.models.cells.hodgkin_huxley import HodgkinHuxleyModel
