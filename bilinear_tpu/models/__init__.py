from bilinear_tpu.models.bilinear import BilinearUnit
from bilinear_tpu.models.end2end import End2End, assemble_variables
from bilinear_tpu.models.hourglass import StackedHourglass
from bilinear_tpu.models.hourglass_torch7 import MainModel
