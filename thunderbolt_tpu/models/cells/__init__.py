from thunderbolt_tpu.models.cells.base import CellModel
from thunderbolt_tpu.models.cells.fhn import FHNModel, AlievPanfilovModel
from thunderbolt_tpu.models.cells.pcg2019 import PCG2019Model
