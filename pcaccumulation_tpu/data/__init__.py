from pcaccumulation_tpu.data.voxelizer import voxelize, pad_sample
from pcaccumulation_tpu.data.dataset import SceneDataset, prep_sample
from pcaccumulation_tpu.data.loader import make_loader, collate
from pcaccumulation_tpu.data.synthetic import generate_sample, write_synthetic_dataset
