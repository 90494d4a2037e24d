from pcaccumulation_tpu.models.motionnet import MotionNet
