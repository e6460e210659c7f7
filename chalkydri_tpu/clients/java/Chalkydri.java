package org.chalkydri.client;

import java.net.DatagramPacket;
import java.net.DatagramSocket;
import java.net.InetAddress;
import java.net.SocketTimeoutException;
import java.nio.ByteBuffer;
import java.nio.ByteOrder;
import java.util.concurrent.ConcurrentHashMap;

/**
 * Robot-side Java client (chalkydrilibj parity — the reference ships only a
 * stub surface, /root/reference/crates/chalkydrilibj/api/Chalkydri.java:6-22).
 *
 * Pure-Java UDP implementation of the whacknet protocol — no JNI needed:
 * listens for 64-byte VisionMeasurement packets
 * (crates/whacknet/src/lib.rs:41-66) on :7001, exposes per-camera
 * measurements and a fused pose, and can stream the gyro heading back to the
 * coprocessor on :7002.
 *
 * WPILib usage: feed {@code getCamera(i)} measurements into
 * {@code SwerveDrivePoseEstimator.addVisionMeasurement(pose, ts, stdDevs)}.
 */
public class Chalkydri {
  public static final int PACKET_SIZE = 64;
  public static final int LISTEN_PORT = 7001;
  public static final int GYRO_PORT = 7002;

  /** One camera's latest measurement. */
  public static final class Measurement {
    public final double x, y, rotation;
    public final double stdX, stdY, stdRot;
    public final long latencyMicros;
    public final int cameraId, tagCount;
    public final long receivedNanos;

    Measurement(ByteBuffer b, long now) {
      x = b.getDouble(0);
      y = b.getDouble(8);
      rotation = b.getDouble(16);
      stdX = b.getDouble(24);
      stdY = b.getDouble(32);
      stdRot = b.getDouble(40);
      latencyMicros = b.getLong(48);
      cameraId = b.get(56) & 0xFF;
      tagCount = b.get(57) & 0xFF;
      receivedNanos = now;
    }
  }

  /** Minimal Pose2d mirror (avoids a hard WPILib dependency). */
  public static final class Pose2d {
    public final double x, y, rotation;

    public Pose2d(double x, double y, double rotation) {
      this.x = x;
      this.y = y;
      this.rotation = rotation;
    }
  }

  private final ConcurrentHashMap<Integer, Measurement> latest = new ConcurrentHashMap<>();
  private final DatagramSocket rxSocket;
  private final DatagramSocket gyroSocket;
  private final InetAddress coprocessor;
  private final Thread rxThread;
  private volatile boolean running = true;
  private final double stalenessSeconds;

  public Chalkydri(String coprocessorAddress) throws Exception {
    this(coprocessorAddress, LISTEN_PORT, 0.5);
  }

  public Chalkydri(String coprocessorAddress, int listenPort, double stalenessSeconds)
      throws Exception {
    this.stalenessSeconds = stalenessSeconds;
    rxSocket = new DatagramSocket(listenPort);
    rxSocket.setSoTimeout(200);
    gyroSocket = new DatagramSocket();
    coprocessor = coprocessorAddress == null ? null : InetAddress.getByName(coprocessorAddress);
    rxThread = new Thread(this::rxLoop, "chalkydri-rx");
    rxThread.setDaemon(true);
    rxThread.start();
  }

  private void rxLoop() {
    byte[] buf = new byte[PACKET_SIZE];
    DatagramPacket pkt = new DatagramPacket(buf, buf.length);
    while (running) {
      try {
        rxSocket.receive(pkt);
        if (pkt.getLength() < PACKET_SIZE) continue;
        ByteBuffer b = ByteBuffer.wrap(buf).order(ByteOrder.LITTLE_ENDIAN);
        Measurement m = new Measurement(b, System.nanoTime());
        latest.put(m.cameraId, m);
      } catch (SocketTimeoutException e) {
        // poll running flag
      } catch (Exception e) {
        if (running) e.printStackTrace();
      }
    }
  }

  /** Latest measurement from one camera (api/Chalkydri.java:8-12 surface). */
  public Measurement getCamera(int cameraId) {
    return latest.get(cameraId);
  }

  /**
   * Inverse-variance fuse of all fresh tag-bearing measurements
   * (api/Chalkydri.java:14-17: calculateRobotPose() -> double[3]).
   */
  public double[] calculateRobotPose() {
    long now = System.nanoTime();
    double wx = 0, wy = 0, wsum = 0, sinSum = 0, cosSum = 0;
    for (Measurement m : latest.values()) {
      if ((now - m.receivedNanos) / 1e9 > stalenessSeconds) continue;
      if (m.tagCount == 0 || m.stdX > 1e30) continue;
      double w = 1.0 / Math.max(m.stdX * m.stdX, 1e-6);
      wx += w * m.x;
      wy += w * m.y;
      double wr = 1.0 / Math.max(m.stdRot * m.stdRot, 1e-6);
      sinSum += wr * Math.sin(m.rotation);
      cosSum += wr * Math.cos(m.rotation);
      wsum += w;
    }
    if (wsum == 0) return null;
    return new double[] {wx / wsum, wy / wsum, Math.atan2(sinSum, cosSum)};
  }

  /** Fused robot pose (api/Chalkydri.java:19-21 surface). */
  public Pose2d getRobotPose() {
    double[] p = calculateRobotPose();
    return p == null ? null : new Pose2d(p[0], p[1], p[2]);
  }

  /** Stream the gyro heading (radians) to the coprocessor (LE f64 on :7002). */
  public void sendGyro(double headingRadians) throws Exception {
    if (coprocessor == null) throw new IllegalStateException("no coprocessor address");
    byte[] data =
        ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putDouble(headingRadians).array();
    gyroSocket.send(new DatagramPacket(data, data.length, coprocessor, GYRO_PORT));
  }

  public void close() {
    running = false;
    rxSocket.close();
    gyroSocket.close();
  }
}
