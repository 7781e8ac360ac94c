"""FEC: CRC (see phy.crc), code-block segmentation, convolutional + turbo
coding, Viterbi + max-log-MAP turbo decoding, rate matching, HARQ softbuffers.
"""
