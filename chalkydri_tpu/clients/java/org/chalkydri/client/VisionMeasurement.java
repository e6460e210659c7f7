package org.chalkydri.client;

import java.nio.ByteBuffer;
import java.nio.ByteOrder;

/**
 * One 64-byte pose packet from the coprocessor.
 *
 * Layout parity with the reference's repr(C) VisionMeasurement
 * (crates/whacknet/src/lib.rs:41-66); see WIRE_FORMAT.md for the
 * byte-level spec this decoder follows.
 */
public final class VisionMeasurement {
  public static final int SIZE = 64;

  public final double x;
  public final double y;
  public final double rotRadians;
  public final double stdDevX;
  public final double stdDevY;
  public final double stdDevRot;
  /** capture-to-publish latency, microseconds */
  public final long latencyMicros;
  public final int cameraId;
  public final int tagCount;
  /** robot wall-clock seconds at packet receipt (set by the receiver) */
  public final double receiveTime;

  private VisionMeasurement(double x, double y, double rot, double sx, double sy,
      double srot, long ts, int cam, int tags, double rxTime) {
    this.x = x;
    this.y = y;
    this.rotRadians = rot;
    this.stdDevX = sx;
    this.stdDevY = sy;
    this.stdDevRot = srot;
    this.latencyMicros = ts;
    this.cameraId = cam;
    this.tagCount = tags;
    this.receiveTime = rxTime;
  }

  /** Decode a 64-byte datagram. Returns null on short packets. */
  public static VisionMeasurement decode(byte[] data, int length, double rxTime) {
    if (length < SIZE) {
      return null;
    }
    ByteBuffer b = ByteBuffer.wrap(data, 0, SIZE).order(ByteOrder.LITTLE_ENDIAN);
    double x = b.getDouble(0);
    double y = b.getDouble(8);
    double rot = b.getDouble(16);
    double sx = b.getDouble(24);
    double sy = b.getDouble(32);
    double srot = b.getDouble(40);
    long ts = b.getLong(48);
    int cam = b.get(56) & 0xFF;
    int tags = b.get(57) & 0xFF;
    return new VisionMeasurement(x, y, rot, sx, sy, srot, ts, cam, tags, rxTime);
  }

  /** Heartbeats carry no pose; distrusted solves carry huge std-devs. */
  public boolean isUsable() {
    return tagCount > 0 && stdDevX < 1e6 && stdDevY < 1e6;
  }
}
